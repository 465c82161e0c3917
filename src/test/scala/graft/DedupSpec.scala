package graft

import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {

  test("d3 minhash+LSH finds exactly the exact-Jaccard ≥ 0.9 pairs") {
    // On the fixed testdata the LSH candidate set must cover every true
    // near-dup pair (this is what licenses the exact-SQL oracle for d3).
    val lsh = graft.queries.Dedup.queries("d3_dedup_minhash")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.queries.Dedup.queries("d5_ngram_jaccard")(spark, sf)
      .filter(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"LSH pairs $lsh != exact pairs $exact")
  }

  test("d1 exact dedup partitions the corpus") {
    val total = Tables.documents(spark, sf).count()
    val sum = graft.queries.Dedup.queries("d1_dedup_exact")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_copies")).collect()(0).getLong(0)
    assert(sum == total)
  }

  test("d7 LSH near-dup is a subset of exact d6 with usable recall") {
    val exact = graft.queries.Dedup.queries("d6_embedding_neardup")(spark, sf)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = graft.queries.Dedup.queries("d7_embedding_neardup_lsh")(spark, sf)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "exact verification must keep precision at 1.0")
    val recall = if (exact.isEmpty) 1.0 else lsh.size.toDouble / exact.size
    assert(recall >= 0.7, s"d7 recall $recall below 0.7 (|exact|=${exact.size})")
  }

  test("d6 block-size guard fails fast when a label block exceeds the bound") {
    // At sf0.001 every label block is far larger than 3, so the guard must
    // fire; with the default bound the query runs to completion.
    spark.conf.set("graft.dedup.maxExactBlock", "3")
    try {
      val ex = intercept[Exception] {
        graft.queries.Dedup.queries("d6_embedding_neardup")(spark, sf).count()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(ex).exists(_.contains("d7_embedding_neardup_lsh")),
        s"guard error must route to d7, got: ${messages(ex)}")
    } finally spark.conf.unset("graft.dedup.maxExactBlock")
    assert(graft.queries.Dedup.queries("d6_embedding_neardup")(spark, sf).count() > 0)
  }

  test("d7 candidate-volume guard fails fast when the bucket estimate exceeds the cap") {
    // The fixed 4-bit tables stop pruning as density grows (BENCHNOTES
    // r10) — the guard must name the cap and the d6 fallback BEFORE pair
    // expansion. At sf0.001 the exact Σ bn(bn−1)/2 estimate is well above
    // 10; with the default cap the query runs to completion.
    spark.conf.set("graft.dedup.d7MaxCandidates", "10")
    try {
      val ex = intercept[Exception] {
        graft.queries.Dedup.queries("d7_embedding_neardup_lsh")(spark, sf).count()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(ex).exists(m =>
        m.contains("d7MaxCandidates") && m.contains("d6_embedding_neardup")),
        s"guard error must name the cap and the d6 fallback, got: ${messages(ex)}")
    } finally spark.conf.unset("graft.dedup.d7MaxCandidates")
    assert(graft.queries.Dedup.queries("d7_embedding_neardup_lsh")(spark, sf).count() > 0)
  }

  test("d9 clusters are consistent components of the d5 pair graph") {
    val pairs = graft.queries.Dedup.queries("d5_ngram_jaccard")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = graft.queries.Dedup.queries("d9_dup_clusters")(spark, sf)
      .select("doc_id", "cluster_id", "cluster_size", "is_rep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val label = clusters.map(c => c._1 -> c._2).toMap
    // exactly the docs that appear in some pair, each labeled once
    assert(label.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // both endpoints of every edge share a component
    pairs.foreach { case (a, b) => assert(label(a) == label(b), s"$a~$b split") }
    // the label is the component minimum, and exactly its owner is rep
    label.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"cluster $cid not labeled by its min")
    }
    assert(clusters.count(_._4) == label.values.toSet.size)
    // sizes agree with membership
    val sizes = clusters.groupBy(_._2).view.mapValues(_.length).toMap
    clusters.foreach { c => assert(c._3 == sizes(c._2), s"size mismatch for ${c._1}") }
    // transitivity did real work on this corpus: some component is larger
    // than a single pair (A~B~C with no direct A~C edge) — guards against
    // a regression to pairwise-only labeling
    assert(sizes.values.max >= 3, s"expected a transitive cluster, got $sizes")
  }

  test("d4 simhash pairs have hamming <= 3 and are deduplicated") {
    val rows = graft.queries.Dedup.queries("d4_dedup_simhash")(spark, sf).collect()
    assert(rows.forall(_.getInt(2) <= 3))
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length == pairs.length)
    assert(pairs.forall(p => p._1 < p._2))
  }
}
