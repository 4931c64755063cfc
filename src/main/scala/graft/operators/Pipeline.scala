package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.table

/** Dataset-assembly operators a training-data pipeline runs after
  * cleaning: deterministic sampling and filter accounting. Both are
  * exact-oracle-checkable (no RNG: "random" order is the shared 60-bit
  * content hash, reproducible in any engine).
  */
object Pipeline {

  /** Deterministic stratified sample: the k docs per source with the
    * smallest `hash60(doc_id)` — a uniform-at-random-in-expectation,
    * seedlessly reproducible choice (re-running over a grown corpus keeps
    * previously-sampled docs unless displaced, the property incremental
    * dataset builds want).
    *
    * Shape: the bounded `MinKAggregator` combines map-side, so only k
    * rows per source per partition reach the shuffle — `sampleBy` gives
    * no exact-k guarantee and a rank window would shuffle every row.
    */
  def stratifiedSample(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.Encoders
    val mink = udaf(new graft.functions.MinKAggregator(k), Encoders.product[(Long, Long)])
    table(s, dir, "documents")
      .select($"source", $"doc_id", expr("hash60(cast(doc_id as string))").as("h"))
      .groupBy($"source")
      .agg(mink($"h", $"doc_id").as("picked"))
      .select($"source", posexplode($"picked"))
      .select($"source", ($"pos" + 1).cast("long").as("rank"),
        $"col._2".as("doc_id"), $"col._1".as("sample_key"))
      .orderBy($"source", $"rank")
  }

  /** Filter funnel: every document lands in exactly one bucket — the
    * first cleaning rule it trips (too short, too repetitive, stopword
    * flood) or `kept` — with per-bucket counts and token mass, so a
    * pipeline run reports precisely what each rule cost. Single pass,
    * one narrow aggregation; the rule ratios reuse q27's
    * oracle-portable arithmetic.
    */
  def filterFunnel(s: SparkSession, dir: String,
                   minTokens: Int = 5,
                   maxStopRatio: Double = 0.5,
                   minDistinctRatio: Double = 0.3): DataFrame = {
    import s.implicits._
    val toks = split($"text", " ")
    val ntok = size(toks).cast("long")
    val ndist = size(array_distinct(toks)).cast("long")
    val nstop = size(filter(toks, t => t.isin("the", "a", "of", "to", "and"))).cast("long")
    table(s, dir, "documents")
      .select($"doc_id", $"text")
      .withColumn("ntok", ntok)
      .withColumn("reason",
        when(ntok < minTokens, "too_short")
          .when(nstop.cast("double") / ntok > maxStopRatio, "stopword_flood")
          .when(ndist.cast("double") / ntok < minDistinctRatio, "repetitive")
          .otherwise("kept"))
      .groupBy($"reason")
      .agg(count(lit(1)).as("n_docs"), sum($"ntok").as("n_tokens"))
      .orderBy($"reason")
  }
}
