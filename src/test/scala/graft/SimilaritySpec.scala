package graft

import org.apache.spark.sql.functions._

/** LSH ANN is not oracle-hashable (bucketing is hash-defined); pin its
  * quality against the exact brute-force top-k instead. */
class SimilaritySpec extends SparkTestBase {

  private def topk(name: String): Map[Long, Set[Long]] =
    graft.queries.Similarity.queries(name)(spark, sf)
      .select(col("q_id"), col("neighbor_id"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

  test("s2_knn_lsh recall@5 vs exact brute force is usable") {
    val exact = topk("s1_knn_brute")
    val approx = topk("s2_knn_lsh")
    assert(exact.nonEmpty)
    val recall = exact.map { case (q, nbrs) =>
      nbrs.intersect(approx.getOrElse(q, Set.empty)).size.toDouble / nbrs.size
    }.sum / exact.size
    assert(recall >= 0.3, s"recall@5 $recall below 0.3")
  }

  test("s4_knn_ivf recall@5 vs exact brute force is usable") {
    val exact = topk("s1_knn_brute")
    val approx = topk("s4_knn_ivf")
    assert(exact.nonEmpty)
    val recall = exact.map { case (q, nbrs) =>
      nbrs.intersect(approx.getOrElse(q, Set.empty)).size.toDouble / nbrs.size
    }.sum / exact.size
    // NPROBE/NLIST = 4/16 scans ~25% of the corpus per query
    assert(recall >= 0.3, s"IVF recall@5 $recall below 0.3")
  }

  test("s1 query-set guard fails fast when the query set exceeds the bound") {
    // At sf0.001 the every-50th query set is far larger than 1, so the
    // guard must fire; with the default bound the query runs to completion.
    spark.conf.set("graft.ann.maxQuerySet", "1")
    try {
      val ex = intercept[Exception] {
        graft.queries.Similarity.queries("s1_knn_brute")(spark, sf).count()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(ex).exists(m => m.contains("s2_knn_lsh") && m.contains("s4_knn_ivf")),
        s"guard error must route to s2/s4, got: ${messages(ex)}")
    } finally spark.conf.unset("graft.ann.maxQuerySet")
    assert(graft.queries.Similarity.queries("s1_knn_brute")(spark, sf).count() > 0)
  }

  test("s1 cosine values are valid and ranked") {
    val rows = graft.queries.Similarity.queries("s1_knn_brute")(spark, sf)
      .select(col("q_id"), col("rk"), col("cosine")).collect()
    assert(rows.forall(r => r.getDouble(2) >= -1.0001 && r.getDouble(2) <= 1.0001))
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(1)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }
}
