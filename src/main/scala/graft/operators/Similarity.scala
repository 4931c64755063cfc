package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.table

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Cosine arithmetic discipline: both engines cast float32 -> double
  * element-wise, then fold products/squares in index order, so the doubles
  * are bit-identical to the DuckDB oracle (a plain ascending-index loop is
  * the same fold).
  *
  * Kernels run on primitive double arrays inside `mapPartitions` /
  * grouped kernels — the interpreted higher-order-function path
  * (`zip_with` + `aggregate`) costs ~20x on the pair loop. Nothing
  * corpus-sized is ever collected or broadcast: exact all-pairs runs over
  * block-partitioned groups, brute-force top-k chunks its query side, and
  * the LSH/IVF generators keep the candidate count near-linear.
  */
object Similarity {

  /** (vec_id, v as double[], norm) rows — the shared input shape. */
  private def vecDs(s: SparkSession, dir: String) = {
    import s.implicits._
    table(s, dir, "embeddings")
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        var i = 0; var ss = 0.0
        while (i < v.length) { ss += v(i) * v(i); i += 1 }
        (id, v, math.sqrt(ss))
      }
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var i = 0; var acc = 0.0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Brute-force cosine top-k: every vec_id % 100 == 0 is a query; rank all
    * other vectors by cosine (ties by vec_id). The query side is processed
    * in fixed-size chunks — each chunk (and only that chunk) is collected
    * and broadcast, the corpus streams through partition-local score loops,
    * and only (query, candidate, score) scalars shuffle into the per-query
    * top-k window. Driver memory is O(queryChunk) however many queries
    * there are; a 1%-of-corpus query set never materializes at once.
    * Brute force is the exact baseline — `annIvf`/`annLsh` are the paths
    * that also bound the compare work at 100 TB.
    */
  def annBruteForce(s: SparkSession, dir: String, k: Int = 5,
                    queryChunk: Int = 512): DataFrame = {
    import s.implicits._
    // cache the corpus: the chunk loop would otherwise rescan the parquet
    // for every per-chunk collect AND every scoring pass (2·chunks scans);
    // cached, the file is read once and spills to executor storage if the
    // corpus outgrows memory
    val vecs = vecDs(s, dir).cache()
    // collect query IDS only (8 bytes each — the vectors stay distributed)
    // and chunk by rank in the sorted id list: each broadcast is genuinely
    // bounded by queryChunk whatever the id distribution (chunking by
    // id arithmetic only bounded it for dense ids), and the count() job
    // the old shape needed is gone
    val queryIds = vecs.filter(_._1 % 100 == 0).map(_._1).collect().sorted
    if (queryIds.isEmpty) {
      vecs.unpersist() // nothing will ever read the cache on this path
      return Seq.empty[(Long, Long, Long, Double)]
        .toDF("query_id", "rank", "neighbor_id", "cosine")
    }
    val perChunk = queryIds.grouped(queryChunk).toSeq.map { ids =>
      val idSet = ids.toSet
      val queries = vecs.filter(t => idSet.contains(t._1)).collect()
      val bq = s.sparkContext.broadcast(queries)
      val scored = vecs.mapPartitions { it =>
        val qs = bq.value
        it.flatMap { case (id, v, n) =>
          qs.iterator.collect { case (qid, qv, qn) if qid != id =>
            (qid, id, dot(v, qv) / (n * qn))
          }
        }
      }.toDF("query_id", "neighbor_id", "cosine")
      // each query lives in exactly one chunk, so its window is complete
      scored.withColumn("rank", row_number().over(
          Window.partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id".asc)))
        .where($"rank" <= k)
    }
    perChunk.reduce(_ unionAll _)
      .select($"query_id", $"rank".cast("long").as("rank"), $"neighbor_id",
        graft.Tables.round6($"cosine").as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  /** Embedding near-duplicate pairs: cosine >= threshold over the upper
    * triangle, computed exactly via block-partitioned pairs. Vectors hash
    * to one of B blocks by id; each of the B(B+1)/2 unordered block pairs
    * is one shuffle group holding its two blocks' vectors, the pair kernel
    * runs inside the group, and only surviving pairs leave the executor.
    * Shuffle volume is N*B rows, per-group memory is 2N/B vectors (B is
    * the executor-fit knob), and driver state is zero — both the
    * broadcast-the-corpus and the all-pairs-join shapes die at 100 TB.
    *
    * The exact-compare work is inherently quadratic here: measured on the
    * test embeddings, the nearest non-pair cosine is 0.4497 against the
    * 0.45 threshold, so no LSH banding reaches recall 1.0 with
    * sub-quadratic candidates (16 hyperplanes catch 5/14 true pairs).
    * For genuinely near-duplicate thresholds (>= ~0.8) feed `annLsh`
    * band candidates into this same exact check instead.
    */
  def cosineNearDupPairs(s: SparkSession, dir: String, threshold: Double = 0.45,
                         blocks: Int = 16): DataFrame = {
    import s.implicits._
    val vecs = vecDs(s, dir)
    val tagged = vecs.flatMap { case (id, v, n) =>
      val b = math.floorMod(id, blocks).toInt
      (0 until blocks).iterator.map { o =>
        (math.min(b, o), math.max(b, o), id, v, n, b)
      }
    }
    val pairs = tagged
      .groupByKey(t => (t._1, t._2))
      .flatMapGroups { (key: (Int, Int), it: Iterator[(Int, Int, Long, Array[Double], Double, Int)]) =>
        val (bi, bj) = key
        val rows = it.map(t => (t._3, t._4, t._5, t._6)).toArray.sortBy(_._1)
        val out = Iterator.tabulate(rows.length) { i =>
          val (ida, va, na, ba) = rows(i)
          Iterator.range(i + 1, rows.length).flatMap { j =>
            val (idb, vb, nb, bb) = rows(j)
            // (bi, bi) groups own within-block pairs; bi < bj groups own
            // exactly the cross-block pairs — each pair scored once
            if (bi != bj && ba == bb) Iterator.empty
            else {
              val c = dot(va, vb) / (na * nb)
              if (c >= threshold) Iterator((ida, idb, c)) else Iterator.empty
            }
          }
        }
        out.flatten
      }.toDF("vec_a", "vec_b", "cosine")
    pairs
      .select($"vec_a", $"vec_b", graft.Tables.round6($"cosine").as("cosine"))
      .orderBy($"vec_a", $"vec_b")
  }

  /** IVF-style ANN: a coarse quantizer (here: per-label centroids — the
    * stand-in for a k-means codebook, computed as elementwise means) maps
    * each query to its nProbe nearest cells; only those cells' vectors are
    * scored exactly. The inverted-file structure is the 100 TB path when
    * LSH recall is insufficient: the corpus partitions/buckets by cell id,
    * a probe touches nProbe cells, and the exact re-rank is bounded.
    * Centroid means go through DECIMAL sums so parallel aggregation order
    * cannot perturb the doubles (the oracle reproduces them exactly).
    */
  def annIvf(s: SparkSession, dir: String, k: Int = 5, nProbe: Int = 2): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    val vecs = table(s, dir, "embeddings")
      .select($"vec_id", $"label",
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", sqrt(aggregate(transform($"v", x => x * x), lit(0.0), _ + _)))
    // build: elementwise DECIMAL-exact centroid per label (the codebook)
    val cents = vecs
      .select($"label", posexplode($"v"))
      .groupBy($"label", $"pos")
      .agg((sum(col("col").cast(DecimalType(25, 12))).cast(DecimalType(30, 12)).cast("double")
        / count(lit(1))).as("c"))
      .groupBy($"label")
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as("cv"))
      .withColumn("cn", sqrt(aggregate(transform($"cv", x => x * x), lit(0.0), _ + _)))
    val queries = vecs.where($"vec_id" % 100 === 0)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn"))
    // probe: nProbe nearest cells per query (deterministic tie-break on label)
    val probed = queries.crossJoin(broadcast(cents))
      .withColumn("csim",
        aggregate(zip_with($"qv", $"cv", _ * _), lit(0.0), _ + _) / ($"qn" * $"cn"))
      .withColumn("crk", row_number().over(
        Window.partitionBy($"query_id").orderBy($"csim".desc, $"label".asc)))
      .where($"crk" <= nProbe)
      .select($"query_id", $"label", $"qv", $"qn")
    // search: exact cosine inside the probed cells only — scored by the
    // primitive-array kernel (same index-order fold as the HOF form and
    // the oracle's list_reduce, ~20x cheaper in the hot loop)
    probed.join(vecs, Seq("label"))
      .where($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id", $"qv", $"qn", $"v", $"nrm")
      .as[(Long, Long, Array[Double], Double, Array[Double], Double)]
      .mapPartitions(_.map { case (q, id, qv, qn, v, n) => (q, id, dot(v, qv) / (n * qn)) })
      .toDF("query_id", "vec_id", "cosine")
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"cosine".desc, $"vec_id".asc)))
      .where($"rank" <= k)
      .select($"query_id", $"rank".cast("long").as("rank"), $"vec_id".as("neighbor_id"),
        graft.Tables.round6($"cosine").as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  /** Random-hyperplane LSH ANN: 16 deterministic hyperplanes (md5-derived
    * weights in [-1, 1], precomputed once on the driver) -> 16-bit sign
    * signature -> 4 bands of 4 bits; a candidate must share >= 1 band with
    * the query; exact cosine re-rank of candidates only. Engine-specific
    * recall by design -> no SQL oracle (rows-only check). The banded
    * equi-join is the plan that survives 100 TB: signatures are 2 bytes a
    * row and candidates per query stay near-constant.
    */
  /** 16 deterministic md5-derived hyperplanes (weights in [-1, 1]) — shared
    * by `annLsh` and `cosineNearDupLsh`, and reproduced verbatim by the
    * q42 DuckDB oracle (same hash→weight arithmetic, same index-order dot
    * fold, so the signatures agree bit-for-bit across engines).
    */
  private def lshPlanes(): Array[Array[Double]] = Array.tabulate(16, 64) { (p, i) =>
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p#$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.take(15), 16) % 2001 - 1000) / 1000.0
  }

  /** (vec_id, v, nrm, sig): each vector's 16-bit sign signature. */
  private def lshSigs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bPlanes = s.sparkContext.broadcast(lshPlanes())
    vecDs(s, dir).mapPartitions { it =>
      val ps = bPlanes.value
      it.map { case (id, v, n) =>
        var sig = 0; var p = 0
        while (p < ps.length) { if (dot(v, ps(p)) >= 0) sig |= 1 << p; p += 1 }
        (id, v, n, sig)
      }
    }.toDF("vec_id", "v", "nrm", "sig")
  }

  /** vec_id → its 4 LSH band keys (4 bits each). */
  private def lshBands(s: SparkSession, sigs: DataFrame): DataFrame = {
    import s.implicits._
    sigs.select($"vec_id", explode(sequence(lit(0), lit(3))).as("band"), $"sig")
      .withColumn("bkey", expr("(sig >> (band * 4)) & 15"))
      .select($"vec_id", $"band", $"bkey")
  }

  def annLsh(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import s.implicits._
    val sigs = lshSigs(s, dir).cache()
    val bands = lshBands(s, sigs)
    // the query side is ~1% of the corpus — plain equi-joins, no broadcast
    // hint: AQE broadcasts when it fits and falls back to shuffle when the
    // query set itself outgrows an executor (it scales with the corpus)
    val qbands = bands.where($"vec_id" % 100 === 0)
      .select($"vec_id".as("query_id"), $"band", $"bkey")
    val cand = bands.join(qbands, Seq("band", "bkey"))
      .where($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id")
      .distinct()
    cand
      .join(sigs.select($"vec_id", $"v", $"nrm"), "vec_id")
      .join(sigs.where($"vec_id" % 100 === 0)
        .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn")), "query_id")
      .select($"query_id", $"vec_id", $"qv", $"qn", $"v", $"nrm")
      .as[(Long, Long, Array[Double], Double, Array[Double], Double)]
      .mapPartitions(_.map { case (q, id, qv, qn, v, n) => (q, id, dot(v, qv) / (n * qn)) })
      .toDF("query_id", "vec_id", "cosine")
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"cosine".desc, $"vec_id".asc)))
      .where($"rank" <= k)
      .select($"query_id", $"rank".cast("long").as("rank"), $"vec_id".as("neighbor_id"),
        graft.Tables.round6($"cosine").as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  /** Candidate-fed exact near-dup — the default scale path for genuinely
    * near-duplicate thresholds (the in-code prescription of
    * `cosineNearDupPairs`, made executable): candidate pairs are vectors
    * sharing >= 1 of the 4 LSH bands, and only candidates reach the exact
    * cosine kernel. Compare work scales with candidate count (near-linear
    * when near-dups are rare) instead of the all-pairs quadratic; the
    * banded equi-join + kernel verify is the same plan family as the
    * minhash/simhash detectors.
    *
    * Unlike `annLsh`'s top-k (whose recall is engine-specific), this IS
    * oracle-checkable: the hyperplanes are deterministic md5 arithmetic,
    * so the oracle reproduces the exact candidate set and the exact
    * cosines. Candidates below the banding bar are missed on both sides
    * identically — recall vs the exhaustive `cosineNearDupPairs` is the
    * documented trade (high-cosine pairs agree on many sign bits, so
    * recall climbs toward 1 as the threshold does).
    */
  def cosineNearDupLsh(s: SparkSession, dir: String,
                       threshold: Double = 0.45): DataFrame = {
    import s.implicits._
    // Shape choice: candidates-then-vector-join (below) vs running the
    // pair kernel inside each (band, bkey) group. The grouped form ships
    // far fewer bytes (4 copies of each vector vs 2 per candidate pair)
    // but puts a whole bucket's C(n,2) compare in ONE task — a skewed
    // bucket (mass-duplicated content, the exact thing near-dup hunts)
    // becomes a straggler. The candidate join redistributes pair work
    // across partitions whatever the bucket skew, so it is the shape that
    // survives adversarial 100 TB inputs; its shuffle volume is bounded
    // by candidate count, which real near-dup corpora keep near-linear.
    val sigs = lshSigs(s, dir).cache()
    val bands = lshBands(s, sigs)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(sigs.select($"vec_id".as("vec_a"), $"v".as("va"), $"nrm".as("na")), "vec_a")
      .join(sigs.select($"vec_id".as("vec_b"), $"v".as("vb"), $"nrm".as("nb")), "vec_b")
      .select($"vec_a", $"vec_b", $"va", $"na", $"vb", $"nb")
      .as[(Long, Long, Array[Double], Double, Array[Double], Double)]
      .mapPartitions(_.flatMap { case (a, b, va, na, vb, nb) =>
        val c = dot(va, vb) / (na * nb)
        if (c >= threshold) Iterator((a, b, c)) else Iterator.empty
      })
      .toDF("vec_a", "vec_b", "cosine")
      .select($"vec_a", $"vec_b", graft.Tables.round6($"cosine").as("cosine"))
      .orderBy($"vec_a", $"vec_b")
  }
}
