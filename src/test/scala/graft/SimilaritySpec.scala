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

  test("s18_pq_adc recall@5 vs exact brute force is usable") {
    val exact = topk("s1_knn_brute")
    val approx = graft.queries.Similarity.queries("s18_pq_adc")(spark, sf)
      .select(col("q_id"), col("vec_id"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(exact.nonEmpty)
    val recall = exact.map { case (q, nbrs) =>
      nbrs.intersect(approx.getOrElse(q, Set.empty)).size.toDouble / nbrs.size
    }.sum / exact.size
    // 8×16 ADC over a 20-candidate pool, uniform codebook seeding:
    // measured mean 0.56 at sf0.001 / 0.60 at sf0.01 (r15). Floor =
    // measured − 0.16 margin for corpus-regen variance (this isotropic
    // corpus is PQ's hard case — no cluster structure to exploit;
    // k-means++ seeding was measured and does NOT move recall here:
    // 0.58/0.325 vs 0.60/0.335 at sf0.01/sf0.1 — kept available via
    // trainCentroids(ppSeed = true), not shipped).
    assert(recall >= 0.4, s"s18 PQ recall@5 $recall below 0.4")
  }

  test("s19_ivfpq recall@5 vs exact brute force is usable") {
    val exact = topk("s1_knn_brute")
    val approx = graft.queries.Similarity.queries("s19_ivfpq")(spark, sf)
      .select(col("q_id"), col("vec_id"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(exact.nonEmpty)
    val recall = exact.map { case (q, nbrs) =>
      nbrs.intersect(approx.getOrElse(q, Set.empty)).size.toDouble / nbrs.size
    }.sum / exact.size
    // The two cuts COMPOUND (8/16 cells probed × residual-PQ pool-40 —
    // the r16 sweep's operating point, BENCHNOTES): measured mean 0.66
    // at sf0.001 / 0.56 at sf0.01 / 0.51 at sf0.1 on the isotropic
    // corpus, vs 0.30/0.40/0.32 at the old 4-cell pool-20 default and a
    // 0.74/0.53 pool-40 exhaustive-routing ceiling. Floor = measured −
    // margin; correctness of everything but the two cuts is
    // hash-certified by s19_exhaustive ≡ s1.
    assert(recall >= 0.45, s"s19 IVFADC recall@5 $recall below 0.45")
  }

  test("s20_ivf_delta recall@5 vs exact brute force is usable") {
    val exact = topk("s1_knn_brute")
    val approx = topk("s20_ivf_delta")
    assert(exact.nonEmpty)
    val recall = exact.map { case (q, nbrs) =>
      nbrs.intersect(approx.getOrElse(q, Set.empty)).size.toDouble / nbrs.size
    }.sum / exact.size
    // IVF-Flat over the frozen vintage codebook: measured mean 0.60 at
    // sf0.001 / 0.52 at sf0.01 (r15) — s4-class recall, as expected
    // (same cut, exact scoring; the codebook being trained on the
    // VINTAGE sample costs nothing here because the corpus is
    // stationary — s15's drift report is the signal to retrain when it
    // is not). Floor = s4's.
    assert(recall >= 0.3, s"s20 incremental-index recall@5 $recall below 0.3")
  }

  test("s18_recall row agrees with the independently-computed recall") {
    // The driver-visible acceptance row (s18_recall, now the collapsed
    // pinned-hash form) and this spec's own s18-vs-s1 intersection must
    // agree — the row is the gate, the spec certifies the row measures
    // what it claims. The per-query layer is checked via recallPerQuery
    // (the same helper the row collapses), the collapsed row via its
    // n_queries/sum_common aggregates.
    val exact = topk("s1_knn_brute")
    val approx = graft.queries.Similarity.queries("s18_pq_adc")(spark, sf)
      .select(col("q_id"), col("vec_id"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val perQ = graft.queries.Similarity.recallPerQuery(spark, sf, "s18_recall",
        graft.queries.Similarity.queries("s18_pq_adc")(spark, sf)
          .select(col("q_id"), col("vec_id")))
      .collect().map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("n_common")).toMap
    assert(perQ.keySet == exact.keySet, "one recall row per guarded query")
    exact.foreach { case (q, nbrs) =>
      val expected = nbrs.intersect(approx.getOrElse(q, Set.empty)).size.toLong
      assert(perQ(q) == expected,
        s"s18_recall n_common for q=$q: perQ ${perQ(q)} != recomputed $expected")
    }
    val row = graft.queries.Similarity.queries("s18_recall")(spark, sf).collect()
    assert(row.length == 1, "collapsed recall row is a single row")
    assert(row(0).getAs[Long]("n_queries") == perQ.size.toLong)
    assert(row(0).getAs[Long]("sum_common") == perQ.values.sum)
  }

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

  test("s13_knn_ivf_sq8 recall@5 vs exact brute force is usable") {
    val exact = topk("s1_knn_brute")
    val approx = topk("s13_knn_ivf_sq8")
    assert(exact.nonEmpty)
    val recall = exact.map { case (q, nbrs) =>
      nbrs.intersect(approx.getOrElse(q, Set.empty)).size.toDouble / nbrs.size
    }.sum / exact.size
    // IVF alone pins >= 0.3 (s4); int8 scoring on top loses a little more
    // on this margin-free isotropic corpus — the composition still has to
    // clear a usability floor.
    assert(recall >= 0.2, s"IVF+SQ8 recall@5 $recall below 0.2")
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

  test("s11 int8 quantization: codes bounded, worst-case error within the step bound") {
    val rows = graft.queries.Similarity.queries("s11_sq8_quantize")(spark, sf)
      .select(split(col("qvec_csv"), ",").cast("array<int>"), col("max_abs_err"))
      .collect()
    assert(rows.nonEmpty)
    // Codes are symmetric int8: q = ⌊x·127/m + 0.5⌋ with |x| ≤ m per dim.
    assert(rows.forall(_.getSeq[Int](0).forall(q => q >= -127 && q <= 127)))
    // Reconstruction bound: |x − q·m/127| ≤ m/254 per dim (half a step),
    // so the per-vector max is ≤ (global max-|x|)/254. Tiny slack for the
    // double arithmetic.
    val globalMax = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(max(array_max(transform(col("embedding"), x => abs(x)))))
      .collect()(0).getFloat(0).toDouble
    val bound = globalMax / 254.0 + 1e-12
    assert(rows.forall(_.getDouble(1) <= bound),
      s"max_abs_err exceeds the quantization step bound $bound")
  }

  test("k-means++ seeding is deterministic and never duplicates a centroid") {
    val rnd = new scala.util.Random(123)
    val sample = Array.fill(200)(Array.fill(8)(rnd.nextFloat()))
    // Plant exact duplicates — the D²-weighted draw must still return k
    // DISTINCT points (a duplicate centroid would freeze a dead cell).
    val withDups = sample ++ sample.take(50)
    val a = graft.queries.Similarity.trainCentroids(withDups, 16, iters = 0, ppSeed = true)
    val b = graft.queries.Similarity.trainCentroids(withDups, 16, iters = 0, ppSeed = true)
    assert(a.length == 16)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "seeded init must be bit-stable")
    assert(a.map(_.toSeq).distinct.length == 16, "no duplicate centroids")
    // Degenerate corpus: fewer distinct VALUES than k — the all-duplicate
    // fallback must still fill k slots (every distinct value represented)
    // without crashing or looping.
    val tiny = Array.fill(30)(sample(0)) ++ sample.slice(1, 4)
    val c = graft.queries.Similarity.trainCentroids(tiny, 16, iters = 0, ppSeed = true)
    assert(c.length == 16)
    assert(c.map(_.toSeq).distinct.length == 4, "all 4 distinct values chosen")
  }

  test("s12 quantized-index recall is measured and sane") {
    val rows = graft.queries.Similarity.queries("s12_sq8_recall")(spark, sf)
      .select(col("n_common"), col("recall_at_5")).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 5))
    assert(rows.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
    // Quality floor: int8 keeps MOST of the exact top-5 even on this
    // isotropic synthetic corpus, whose top-5 margins are noise-level
    // (the hardest case for any quantizer — real clustered embedding
    // corpora rank higher). Loose on purpose at the tiny test SF.
    val mean = rows.map(_.getDouble(1)).sum / rows.length
    assert(mean >= 0.2, s"mean recall@5 $mean below 0.2")
  }

  private def topk17(name: String): Map[Long, Set[Long]] =
    graft.queries.Similarity.queries(name)(spark, sf)
      .select(col("q_id"), col("vec_id"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

  test("s17_scale recall@5 vs the exhaustive hamming anchor is usable") {
    val exact = topk17("s17_hamming_rerank")
    val approx = topk17("s17_scale")
    assert(exact.nonEmpty)
    val recall = exact.map { case (q, nbrs) =>
      nbrs.intersect(approx.getOrElse(q, Set.empty)).size.toDouble / nbrs.size
    }.sum / exact.size
    // 12×5 chunk probing measured 0.68 here (sf0.001) / 0.80 at sf0.01
    // scanning ~32% of the cross product; floor with headroom for corpus
    // regens. This corpus is the hard case — its true neighbors sit at
    // Hamming 17–25 of 64, near the random mean.
    assert(recall >= 0.5, s"s17_scale recall@5 $recall below 0.5")
  }

  test("s17_scale pigeonhole: a neighbor within Hamming tables-1 is never missed") {
    val spark0 = spark
    import spark0.implicits._
    // Planted corpus: query 50 = all-positive signs; neighbor 51 flips
    // exactly 11 of 64 signs — Hamming 11 ≤ tables−1 = 11, so the disjoint
    // 12×5 chunk guarantee says SOME chunk must match and the pair cannot
    // be dropped by bucketing, whatever the rest of the corpus does.
    // Backgrounds have exactly 32 positive dims (cosine 0 to the query,
    // Hamming 32), so the planted pair is also the clear cosine winner.
    val query = (50L, Array.fill(64)(1.0f), 1)
    val neighbor = (51L, Array.tabulate(64)(i => if (i < 11) -1.0f else 1.0f), 1)
    val background = (0 until 50).map { i =>
      val id = 101L + i // never ≡ 0 (mod 50): backgrounds are not queries
      (id, Array.tabulate(64)(j => if ((j + i) % 64 < 32) 1.0f else -1.0f), 2)
    }
    val dir = java.nio.file.Files.createTempDirectory("s17pigeon").toString
    (Seq(query, neighbor) ++ background)
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.queries.Similarity.queries("s17_scale")(spark, dir)
      .filter(col("q_id") === 50L && col("rank") === 1)
      .select(col("vec_id"), col("hamming")).collect()
    assert(out.length == 1 && out(0).getLong(0) == 51L && out(0).getInt(1) == 11,
      s"planted Hamming-11 neighbor not retrieved at rank 1: ${out.mkString}")
  }
}
