package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Earns q25's rows-only oracle exemption: LSH ANN recall is
  * engine-specific by design, so the driver can't hash-compare it — this
  * spec pins it against the exact brute-force top-k instead, so a banding
  * or signature regression (recall collapsing toward the ~0.05 random-
  * guess overlap) fails the build.
  *
  * Bound context: the synthetic embeddings are near-uniform (measured
  * pairwise cosine mass around 0.3-0.45 with no cluster structure), the
  * adversarial case for any sublinear ANN — measured mean recall@5 is
  * 0.44 with ~24% of the corpus as candidates at sf0.01. Configs reaching
  * recall ~1.0 on this data must examine >85% of the corpus, which is no
  * longer an index. On clustered real-world embeddings the same 4x4
  * banding concentrates candidates and recall rises; the gate here checks
  * the machinery, not a universal recall promise.
  */
class SimilarityRecallSpec extends AnyFunSuite with SparkFixture {

  test("LSH ANN recall@5 >= 0.4 vs exact brute force at sf0.01") {
    val dir = "/root/testdata/sf0.01"
    def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = topk(Similarity.annBruteForce(spark, dir))
    val approx = topk(Similarity.annLsh(spark, dir))
    assert(approx.keySet === exact.keySet, "every query must return candidates")
    val recalls = exact.map { case (q, t) => (t & approx(q)).size.toDouble / t.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, s"mean recall@5 $mean fell below the measured-floor gate " +
      s"(per-query: ${recalls.toSeq.sortBy(identity).mkString(", ")})")
  }
}
