package graft

import org.apache.spark.sql.functions._

/** Fast regression pins for the round-13 operators (t23 PII scrub, e28
  * linear interpolation, q65 profile drift, s2_exhaustive, e29–e31, s15,
  * s16, q66/q67, t26, mm7) on purpose-built miniature corpora — the oracle
  * gates certify these against DuckDB per run; this keeps the engine-side
  * contracts under plain `sbt test` so a regression surfaces in seconds. */
class PipelineOpsSpec extends SparkTestBase {

  private def docsCorpus(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("pipeops").toString
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "src0") }
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t23 counts every PII class once in the text and once in the synthetic suffix") {
    // doc_id=4 ⇒ suffix carries user4@example.com, 555-004-0004, 10.4.0.1,
    // 123-45-0012, 4111-1111-1111-0028 (the doc_id-derived constructions).
    val dir = docsCorpus(Seq((4L,
      "call 555-123-4567 or write jo.e@x.io card 4111-1111-1111-1234 " +
        "ip 1.2.3.4 ssn 123-45-6789")))
    val r = SparkEntry.queries("t23_pii_scrub")(spark, dir).collect()
    assert(r.length == 1)
    val row = r(0)
    // Columns: doc_id, n_cc, n_ssn, n_phone, n_ip, n_email, scrub_len, scrub_md5
    for ((cat, i) <- Seq("cc" -> 1, "ssn" -> 2, "phone" -> 3, "ip" -> 4, "email" -> 5))
      assert(row.getLong(i) == 2L, s"n_$cat = ${row.getLong(i)}, want 2 ($row)")
  }

  test("t23 scrub is sequential: a dotted phone is a phone, not three IP octets") {
    val dir = docsCorpus(Seq((0L, "dial 555.123.4567 now")))
    val row = SparkEntry.queries("t23_pii_scrub")(spark, dir).collect()(0)
    assert(row.getLong(3) == 2L, s"dotted phone + suffix phone: $row") // n_phone
    assert(row.getLong(4) == 1L, s"only the suffix IP remains: $row")  // n_ip
  }

  private val h = 3600L * 1000000000L // 1 hour in the nanos ts vintage
  private val jan1 = 1704067200L * 1000000000L // 2024-01-01T00:00Z

  test("e28 interpolates interior gaps linearly and leaves the edges NULL") {
    val dir = java.nio.file.Files.createTempDirectory("pipeops").toString
    import spark.implicits._
    Seq((1L, Some("a"), Some(jan1 + h), Some(10.0)),
        (2L, Some("a"), Some(jan1 + 4 * h), Some(40.0)))
      .toDF("event_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("e28_interp_linear")(spark, dir)
      .filter(col("event_type") === "a")
      .orderBy(col("slot")).collect()
    assert(rows.length == 744) // hourly grid over January
    def interpAt(i: Int): Option[Double] =
      if (rows(i).isNullAt(3)) None else Some(rows(i).getDouble(3))
    assert(interpAt(0).isEmpty, "before the first observation: NULL (no extrapolation)")
    assert(interpAt(1).contains(10.0), "observed slots pass through")
    assert(interpAt(2).contains(20.0) && interpAt(3).contains(30.0),
      s"linear interior fill, got ${interpAt(2)}/${interpAt(3)}")
    assert(interpAt(4).contains(40.0))
    assert(interpAt(5).isEmpty && interpAt(743).isEmpty,
      "after the last observation: NULL")
  }

  test("q65 flags range widening in the new vintage and stays quiet on identical splits") {
    val dir = java.nio.file.Files.createTempDirectory("pipeops").toString
    import spark.implicits._
    // Even orderkeys = vintage A (quantity 1..2), odd = vintage B (quantity 100):
    // l_quantity must flag drift (range widened); l_linenumber is identical
    // across vintages and must not.
    val ship = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    Seq((2L, 1L, 1L, 1, 1.0, 0.0, 0.0, ship, "N", "O"),
        (4L, 2L, 2L, 1, 2.0, 0.0, 0.0, ship, "N", "O"),
        (5L, 3L, 3L, 1, 100.0, 0.0, 0.0, ship, "N", "O"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_discount", "l_tax", "l_shipdate",
        "l_returnflag", "l_linestatus")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val byCol = SparkEntry.queries("q65_profile_drift")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(byCol("l_quantity").getBoolean(9), "quantity range widened => drift")
    assert(byCol("l_quantity").getBoolean(8), "range_widened must be true")
    assert(!byCol("l_linenumber").getBoolean(9), "identical vintages => no drift")
  }

  test("s2_exhaustive (1 table x 0 bits) returns exactly s1's brute-force ranking") {
    val s1 = SparkEntry.queries("s1_knn_brute")(spark, sf).collect().map(_.toString).toSeq
    val s2 = SparkEntry.queries("s2_exhaustive")(spark, sf).collect().map(_.toString).toSeq
    assert(s1.nonEmpty && s1 == s2)
  }

  private def eventsCorpus(rows: Seq[(Long, Option[String], Option[Long], Option[Double])]): String = {
    val dir = java.nio.file.Files.createTempDirectory("pipeops").toString
    import spark.implicits._
    rows.map { case (id, t, ts, v) => (id, t, ts, v, 1L) }
      .toDF("event_id", "event_type", "ts", "value", "user_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("e29 splits runs on null-safe type changes and chains effectivity") {
    // user 1 timeline: a, a, b, NULL, NULL, a  =>  4 runs
    val dir = eventsCorpus(Seq(
      (1L, Some("a"), Some(jan1 + 1 * h), Some(1.0)),
      (2L, Some("a"), Some(jan1 + 2 * h), Some(1.0)),
      (3L, Some("b"), Some(jan1 + 3 * h), Some(1.0)),
      (4L, None, Some(jan1 + 4 * h), Some(1.0)),
      (5L, None, Some(jan1 + 5 * h), Some(1.0)),
      (6L, Some("a"), Some(jan1 + 6 * h), Some(1.0)),
      (7L, Some("x"), None, Some(1.0)))) // null ts: out of scope
    val r = SparkEntry.queries("e29_scd2")(spark, dir).collect()
    assert(r.length == 4, s"4 runs, got ${r.mkString("; ")}")
    // (ver, attr, n_events, is_current)
    val runs = r.map(x => (x.getLong(1), Option(x.getString(2)), x.getLong(5), x.getLong(6)))
    assert(runs.toSeq == Seq(
      (1L, Some("a"), 2L, 0L), (2L, Some("b"), 1L, 0L),
      (3L, None, 2L, 0L), (4L, Some("a"), 1L, 1L)))
    // valid_to of run k == valid_from of run k+1; open-ended current row.
    val vf = r.map(_.getTimestamp(3)); val vt = r.map(x => Option(x.getTimestamp(4)))
    assert(vt.init.map(_.get).sameElements(vf.tail) && vt.last.isEmpty)
  }

  test("e30 locates the level shift at the last pre-shift hour") {
    // 20 hourly points: value 10 for hours 1..10, 20 for hours 11..20.
    // Weighted CUSUM vs the overall mean (15) bottoms at -50 on hour 10.
    val dir = eventsCorpus((1 to 20).map { i =>
      (i.toLong, Some("a"), Some(jan1 + i * h), Some(if (i <= 10) 10.0 else 20.0))
    })
    val r = SparkEntry.queries("e30_cusum")(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 20L, s"n_hours: ${r(0)}")
    assert(r(0).getTimestamp(2).getTime == (jan1 + 10 * h) / 1000000L, s"cp_hr: ${r(0)}")
    assert(math.abs(r(0).getDouble(3) + 50.0) < 1e-9, s"cp_cusum: ${r(0)}")
  }

  test("s15 flags vanished, newborn and share-shifted cells") {
    val dir = java.nio.file.Files.createTempDirectory("pipeops").toString
    import spark.implicits._
    // 4-dim vectors (graft.embedding.dim override), cell = sign bits of
    // dims 1..4 within the 6-bit window. Even ids = old, odd = new.
    def v(bits: Int): Array[Float] =
      (0 until 4).map(i => if ((bits & (1 << i)) != 0) 1.0f else -1.0f).toArray
    val rows: Seq[(Long, Array[Float], Int)] =
      // cell 0: old-only (vanished); cell 1: new-only (newborn);
      // cell 2: balanced 2/2; cell 3: 1 old vs 3 new (lift 1.8 < 2, ok)
      Seq((0L, v(0), 0), (2L, v(0), 0),
          (1L, v(1), 0), (3L, v(1), 0),
          (4L, v(2), 0), (6L, v(2), 0), (5L, v(2), 0), (7L, v(2), 0),
          (8L, v(3), 0), (9L, v(3), 0), (11L, v(3), 0), (13L, v(3), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    spark.conf.set("graft.embedding.dim", "4")
    try {
      val got = SparkEntry.queries("s15_embedding_drift")(spark, dir).collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(6)))).toMap
      assert(got(0) == ((2L, 0L, 1L)), s"old-only cell must drift: $got")
      assert(got(1) == ((0L, 2L, 1L)), s"new-only cell must drift: $got")
      assert(got(2) == ((2L, 2L, 0L)), s"balanced cell must not drift: $got")
      // 1/5 old vs 3/7 new: lift = (3/7)/(1/5) = 15/7 ≈ 2.14 > 2 ⇒ drift
      assert(got(3) == ((1L, 3L, 1L)), s"share-shifted cell: $got")
    } finally spark.conf.unset("graft.embedding.dim")
  }

  test("q66 matches within the block under the ASCII fuzzy contract") {
    val dir = java.nio.file.Files.createTempDirectory("pipeops").toString
    import spark.implicits._
    Seq((1L, "Acme Corp", 7, 1.0, "AUTO"), (2L, "Acme Corq", 7, 1.0, "AUTO"),
        (3L, "Acme Corp", 7, 1.0, "AUTO"),   // exact dup => dist 0
        (4L, "Acme Xorp", 7, 1.0, "AUTO"),   // lev 1 but edit outside last-3 block
        (5L, "Custömer#000000001", 7, 1.0, "AUTO"), // non-ASCII: out of domain
        (6L, "Customer#000000001", 7, 1.0, "AUTO"),
        (7L, "ab", 7, 1.0, "AUTO"), (8L, "ay", 7, 1.0, "AUTO"),
        (9L, "xy", 7, 1.0, "AUTO"),          // ab↔xy is lev 2: no match
        (10L, "Acme Corp", 8, 1.0, "AUTO"),  // other nation
        (11L, "Acme Corp", 7, 1.0, "MACH"))  // other segment
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = SparkEntry.queries("q66_entity_match")(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(4))).toSeq
    assert(got == Seq((1L, 2L, 1L), (1L, 3L, 0L), (2L, 3L, 1L),
      (7L, 8L, 1L), (8L, 9L, 1L)), s"got ${got.mkString("; ")}")
  }

  private def usersCorpus(rows: Seq[(Long, Option[Long], Option[Long])]): String = {
    val dir = java.nio.file.Files.createTempDirectory("pipeops").toString
    import spark.implicits._
    rows.map { case (id, u, ts) => (id, u, ts, Some("a"), Some(1.0)) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("e31 breaches on the 4th event inside 6h; >6h-apart events never breach; null keys out") {
    val dir = usersCorpus(Seq(
      // user 1: four events inside one 6h window — counts 1,2,3,4; the
      // 4th is the one breach — then a 5th far outside it (count 1).
      (1L, Some(1L), Some(jan1)),
      (2L, Some(1L), Some(jan1 + 1 * h)),
      (3L, Some(1L), Some(jan1 + 2 * h)),
      (4L, Some(1L), Some(jan1 + 3 * h)),
      (5L, Some(1L), Some(jan1 + 12 * h)),
      // user 2: two events 10h apart — never more than 1 in any window.
      (6L, Some(2L), Some(jan1)),
      (7L, Some(2L), Some(jan1 + 10 * h)),
      // unattributable rows: excluded by the e-family null-key contract.
      (8L, None, Some(jan1)),
      (9L, Some(1L), None)))
    val r = SparkEntry.queries("e31_rate_limit")(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        Option(x.getTimestamp(3)).map(_.getTime))).toSeq
    assert(r == Seq(
      (1L, 4L, 1L, Some((jan1 + 3 * h) / 1000000L)),
      (2L, 1L, 0L, None)), s"got ${r.mkString("; ")}")
  }

  test("s16 drops a zero-prefix candidate from the truncated rankings even at full rank 1") {
    val dir = java.nio.file.Files.createTempDirectory("pipeops").toString
    import spark.implicits._
    // dim 4 ⇒ prefixes are dims [1] and [1,2]. Query = vec 0 (%50 = 0).
    // Candidate 1 has the HIGHEST full cosine but a zero prefix — its
    // truncated cosines are NULL (x/0 guard) and it ranks last, exactly
    // the acceptance signal s16 exists to surface. Candidates 2..7 are
    // identical, so both truncated top-5s are {2,3,4,5,6} by the vec_id
    // tie-break while the full top-5 is {1,2,3,4,5}: overlap 4/5.
    val rows: Seq[(Long, Array[Float], Int)] =
      (0L, Array(0.1f, 0.1f, 1f, 1f), 0) +:
        (1L, Array(0f, 0f, 1f, 1f), 0) +:
        (2L to 7L).map(i => (i, Array(1f, 1f, 1f, 1f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    spark.conf.set("graft.embedding.dim", "4")
    try {
      val r = SparkEntry.queries("s16_prefix_recall")(spark, dir).collect()
      assert(r.length == 1 && r(0).getLong(0) == 0L, r.mkString("; "))
      assert(r(0).getLong(1) == 4L && r(0).getLong(2) == 4L, r(0).toString)
      assert(r(0).getDouble(3) == 0.8 && r(0).getDouble(4) == 0.8, r(0).toString)
    } finally spark.conf.unset("graft.embedding.dim")
  }

  test("q67 estimates from admitted keys only and the exact twin is the true join size") {
    val dir = java.nio.file.Files.createTempDirectory("pipeops").toString
    import spark.implicits._
    // Keys chosen so the md5 admit verdict is computed independently here.
    def admitted(k: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 16 == 0
    }
    val keys = 1L to 200L
    keys.map(k => Tuple1(k)).toDF("o_orderkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // lineitem: key k appears (k % 3 + 1) times.
    keys.flatMap(k => Seq.fill((k % 3 + 1).toInt)(k)).map(Tuple1(_))
      .toDF("l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // events: 3 users with frequencies 2, 3, 4 (self-join F2 = 4+9+16).
    val ev = Seq.fill(2)(10L) ++ Seq.fill(3)(11L) ++ Seq.fill(4)(12L)
    ev.zipWithIndex.map { case (u, i) => (i.toLong, Some(u), Some(jan1 + i * h)) }
      .map { case (id, u, ts) => (id, u, ts, Some("a"), Some(1.0)) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val exactOL = keys.map(k => (k % 3 + 1)).sum
    val estOL = 16L * keys.filter(admitted).map(k => (k % 3 + 1)).sum
    val exactEE = 4L + 9L + 16L
    val estEE = 16L * Seq(10L -> 4L, 11L -> 9L, 12L -> 16L)
      .collect { case (u, f2) if admitted(u) => f2 }.sum
    val r = SparkEntry.queries("q67_join_size_est")(spark, dir).collect()
      .map(x => x.getString(0) -> ((x.getDouble(1), x.getLong(2)))).toMap
    assert(r("orders_lineitem") == ((estOL.toDouble, exactOL)), r.toString)
    assert(r("events_self") == ((estEE.toDouble, exactEE)), r.toString)
  }

  test("t26 head concentration counts exactly the top-100 words under (freq DESC, word)") {
    // One word 50×, then 150 hapax words: vocab 151, tokens 200; the head
    // is the heavy word + the first 99 hapaxes in word order = 149 tokens.
    val heavy = Seq.fill(50)("zz").mkString(" ")
    val tail = (1 to 150).map(i => f"w$i%03d").mkString(" ")
    val dir = docsCorpus(Seq((1L, heavy), (2L, tail)))
    val r = SparkEntry.queries("t26_vocab_zipf")(spark, dir).collect()
    assert(r.length == 1, r.mkString("; "))
    val row = r(0)
    // source, n_tokens, vocab, hapax, top100_tokens, ttr, hapax_ratio, top100_share
    assert(row.getLong(1) == 200L && row.getLong(2) == 151L &&
      row.getLong(3) == 150L && row.getLong(4) == 149L, row.toString)
    assert(math.abs(row.getDouble(7) - 0.745) < 1e-12, row.toString)
  }

  test("mm7 chunks bytes (not chars): ragged tail sized right, empty blobs emit no rows") {
    // 1025 two-byte chars = 2050 bytes ⇒ chunks of 2048 and 2 bytes — the
    // split lands mid-codepoint, which is exactly right for a BYTE-range
    // transfer manifest; the empty doc yields no manifest rows.
    val dir = docsCorpus(Seq((1L, "é" * 1025), (2L, "")))
    val r = SparkEntry.queries("mm7_chunk_manifest")(spark, dir).collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getLong(3), x.getLong(4))).toSeq
    assert(r == Seq((1L, 0, 2, 0L, 2048L), (1L, 1, 2, 2048L, 2L)),
      s"got ${r.mkString("; ")}")
  }

  test("t28 shards partition the corpus; the plan is a pure function of the keys") {
    // t28 reads n_chars (the byte manifest), which docsCorpus omits.
    val rows = Seq((1L, "a b c"), (2L, "d e"), (3L, ""), (4L, "x"),
      (5L, "y z"), (6L, "w"), (7L, "q r s t"), (8L, "u"))
    val dir = java.nio.file.Files.createTempDirectory("pipeops").toString
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val q = SparkEntry.queries("t28_shard_plan")(spark, dir)
    val r = q.collect()
    assert(r.map(_.getLong(1)).sum == 8L, "every doc lands in exactly one shard")
    assert(r.map(_.getLong(2)).sum == 14L, "token totals are conserved") // 3+2+0+1+2+1+4+1
    assert(r.forall(x => x.getInt(0) >= 0 && x.getInt(0) < 16), "16 shards")
    // first/last come from the md5 permutation: re-running must not move them
    // (no seed, no wall clock anywhere in the plan).
    assert(q.collect().toSeq == r.toSeq, "shard plan must be deterministic")
  }

  test("mm8: exact blob copies share every frame; unique blobs share none") {
    // docs 1/2 are byte-identical (all frames shared); doc 3 is unique.
    val dir = docsCorpus(Seq((1L, "A" * 300), (2L, "A" * 300), (3L, "B" * 300)))
    val r = SparkEntry.queries("mm8_frame_dedup")(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3))).toSeq
    // 300 bytes ⇒ frames at offsets 0/64/128/192/256 = 5 frames per doc.
    assert(r == Seq((1L, 5L, 5L, 1.0), (2L, 5L, 5L, 1.0), (3L, 5L, 0L, 0.0)),
      s"got ${r.mkString("; ")}")
  }

  test("e33 peak counts closed-open intervals: an end at t never overlaps a start at t") {
    val min = 60L * 1000000000L // 1 minute in the nanos ts vintage
    // type a: starts at 0/2/4/9 min ⇒ [0,5) [2,7) [4,9) [9,14). At minute 4
    // three intervals are open (the peak); the interval ending exactly at 9
    // must NOT overlap the one starting at 9 (ends sort before starts).
    val dir = eventsCorpus(Seq(
      (1L, Some("a"), Some(jan1), Some(1.0)),
      (2L, Some("a"), Some(jan1 + 2 * min), Some(1.0)),
      (3L, Some("a"), Some(jan1 + 4 * min), Some(1.0)),
      (4L, Some("a"), Some(jan1 + 9 * min), Some(1.0)),
      (5L, Some("b"), Some(jan1 + 1 * min), Some(1.0)),
      (6L, Some("c"), None, Some(1.0)))) // null ts: no interval
    val r = SparkEntry.queries("e33_peak_concurrency")(spark, dir).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getTimestamp(2).getTime)).toSeq
    val t0 = jan1 / 1000000000L * 1000L // epoch millis of jan1
    assert(r == Seq(("a", 3L, t0 + 4 * 60000L), ("b", 1L, t0 + 60000L)),
      s"got ${r.mkString("; ")}")
  }

  test("t29 reports groups strictly below k; a null quasi-identifier is its own group") {
    val dir = java.nio.file.Files.createTempDirectory("pipeops").toString
    import spark.implicits._
    // lang=en group has exactly 5 members (NOT reported — k-anonymous);
    // lang=fr has 2 (reported); the null-lang singleton is reported as
    // its own group, not merged or dropped.
    val rows = (1L to 5L).map(i => (i, "txt", Some("en"), "s0", 10L)) ++
      Seq((6L, "txt", Some("fr"), "s0", 10L), (7L, "txt", Some("fr"), "s0", 10L),
        (8L, "txt", None, "s0", 10L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("t29_k_anonymity")(spark, dir).collect()
      .map(x => (Option(x.getString(0)), x.getLong(3), x.getLong(4))).toSeq
    // total 8 docs: fr 2/8 = 250000 ppm, null 1/8 = 125000 ppm
    assert(r == Seq((None, 1L, 125000L), (Some("fr"), 2L, 250000L)),
      s"got ${r.mkString("; ")}")
  }

  test("s17 collapses to exact s1 when the pool covers the corpus; hamming prunes right") {
    val dir = java.nio.file.Files.createTempDirectory("pipeops").toString
    import spark.implicits._
    // 12 corpus vectors (< pool 20) ⇒ every candidate is reranked, so the
    // top-5 must equal s1's exact brute-force ranking verbatim.
    def v(bits: Int, mag: Float): Array[Float] =
      (0 until 4).map(i => (if ((bits & (1 << i)) != 0) mag else -mag) * (i + 1)).toArray
    val rows = (0 until 12).map(i => (i.toLong, v(i % 16, 1.0f + i * 0.1f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    spark.conf.set("graft.embedding.dim", "4")
    try {
      val s17 = SparkEntry.queries("s17_hamming_rerank")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      val s1 = SparkEntry.queries("s1_knn_brute")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getInt(2), r.getLong(1))).toSeq
      assert(s17 == s1, s"s17 $s17 != s1 $s1")
      // hamming of a vector against itself-signed twin is 0; against the
      // all-flipped twin it is the full dimension.
      val byPair = SparkEntry.queries("s17_hamming_rerank")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(3)).toMap
      // vec 0 (bits 0) vs vec 15? not present; check 0 vs 1 (bits differ in dim 0)
      assert(byPair.get((0L, 1L)).forall(_ == 1), byPair.toString)
    } finally spark.conf.unset("graft.embedding.dim")
  }

  test("q69 join ivm covers all four delta routes and keeps the SUM/NULL distinction") {
    val dir = java.nio.file.Files.createTempDirectory("pipeops").toString
    import spark.implicits._
    val t0 = 1704067200000L // 2024-01-01T00:00Z millis
    val day = 86400000L
    def ts(d: Int): Option[java.sql.Timestamp] = Some(new java.sql.Timestamp(t0 + d * day))
    // custkeys {1,2,17}: key-span cutoff = 1 + ((17-1) div 16)*15 = 16, so
    // customer 17 (unique nation 99) is ΔC. Order dates span day 0..16:
    // cutoff = day 15, so day-16 orders are ΔO.
    Seq((1L, "c1", 1, 0.0, "B"), (2L, "c2", 2, 0.0, "B"), (17L, "c17", 99, 0.0, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq(
      (1L, Some(1L), "O", Some(10.0), ts(0)),            // base ⋈ base
      (2L, Some(1L), "O", Some(20.5), ts(1)),            // base ⋈ base
      (3L, Some(2L), "F", Some(Double.NaN), ts(2)),      // non-finite price
      (4L, Some(2L), "F", None, ts(4)),                  // null price
      (5L, Some(17L), "N", Some(5.25), ts(16)),          // ΔO ⋈ ΔC (cross term)
      (6L, Some(1L), "O", Some(1.0), ts(16)),            // ΔO ⋈ base C
      (7L, Some(17L), "P", Some(2.0), ts(3)),            // base O ⋈ ΔC
      (8L, None, "O", Some(1.0), ts(1)),                 // null join key: out
      (9L, Some(999L), "O", Some(1.0), ts(1)),           // orphan: out
      (10L, Some(1L), "O", Some(4.0), None))             // null date: base
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = SparkEntry.queries("q69_ivm_join")(spark, dir).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getLong(2), x.getLong(3),
        if (x.isNullAt(4)) None else Some(x.getLong(4)))).toSeq
    // (2,F) proves the n_vals contract: two joined orders, ZERO finite
    // prices ⇒ sum_cents NULL (not 0); (99,*) groups exist ONLY via the
    // delta joins — absent from the base vintage entirely.
    assert(r == Seq(
      (1, "O", 4L, 4L, Some(3550L)),
      (2, "F", 2L, 0L, None),
      (99, "N", 1L, 1L, Some(525L)),
      (99, "P", 1L, 1L, Some(200L))), s"got ${r.mkString("; ")}")
  }

  private def q70Corpus(dir: String,
      customers: Seq[(Option[Long], String)],
      orders: Seq[(Long, Option[Long], String, Option[Double])],
      lineitems: Seq[(Option[Long], Option[Double])],
      users: Seq[Option[Long]]): Unit = {
    val spark0 = spark
    import spark0.implicits._
    customers.map { case (k, nm) => (k, nm, 1, 1.0, "B") }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    orders.map { case (ok, ck, st, p) =>
      (ok, ck, st, p, Some(new java.sql.Timestamp(1704067200000L))) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    lineitems.map { case (ok, q) => (ok, q) }
      .toDF("l_orderkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    users.zipWithIndex.map { case (u, i) =>
      (i.toLong, u, Some(1704067200L * 1000000000L + i), Some("a"), Some(1.0)) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("q70 trips every expectation class exactly once on a one-of-each corpus") {
    val dir = java.nio.file.Files.createTempDirectory("pipeops").toString
    q70Corpus(dir,
      // duplicate key (uniqueness), null key (completeness)
      customers = Seq((Some(1L), "a"), (Some(1L), "b"), (None, "c")),
      // bad status X, negative price, orphan custkey 99, null price
      orders = Seq((1L, Some(1L), "X", Some(10.0)),
        (2L, Some(1L), "O", Some(-5.0)),
        (3L, Some(99L), "F", Some(1.0)),
        (4L, Some(1L), "P", None)),
      // zero quantity, orphan orderkey 77
      lineitems = Seq((Some(1L), Some(5.0)), (Some(77L), Some(0.0))),
      users = Seq(None, Some(1L)))
    val r = SparkEntry.queries("q70_expectations")(spark, dir).collect()
      .map(x => (x.getString(0), x.getLong(2), x.getLong(3), x.getLong(5),
        x.getInt(6))).toSeq
    assert(r == Seq(
      ("c_custkey_not_null", 1L, 3L, 333333L, 0),
      ("c_custkey_unique", 1L, 2L, 500000L, 0),
      ("e_user_not_null", 1L, 2L, 500000L, 0),
      ("l_orderkey_ref", 1L, 2L, 500000L, 0),
      ("l_qty_positive", 1L, 2L, 500000L, 0),
      ("o_custkey_ref", 1L, 4L, 250000L, 0),
      ("o_price_valid", 1L, 3L, 333333L, 0),
      ("o_status_domain", 1L, 4L, 250000L, 0)), s"got ${r.mkString("; ")}")
  }

  test("q70 empty tables pass vacuously - the ANSI zero-denominator guard") {
    val dir = java.nio.file.Files.createTempDirectory("pipeops").toString
    q70Corpus(dir, customers = Seq.empty, orders = Seq.empty,
      lineitems = Seq.empty, users = Seq.empty)
    val r = SparkEntry.queries("q70_expectations")(spark, dir).collect()
      .map(x => (x.getString(0), x.getLong(2), x.getLong(3),
        x.isNullAt(5), x.getInt(6))).toSeq
    assert(r.length == 8 && r.forall(t => t._2 == 0L && t._3 == 0L && t._4 && t._5 == 1),
      s"empty corpus must pass all checks vacuously with NULL ppm: ${r.mkString("; ")}")
  }

  test("p4 retracts retro-contaminated vintage docs and matches the p2 recompute") {
    val dir = java.nio.file.Files.createTempDirectory("pipeops").toString
    val spark0 = spark
    import spark0.implicits._
    // Key span 1..1002 ⇒ cutoff 501: docs 1–4 are the vintage, 1000+ the
    // delta. Doc 1 survives YESTERDAY (clean vs vintage eval 3) but the
    // newly arrived eval doc 1002 shares the shingle "alpha beta gamma"
    // with it — the retroactive-retraction branch. Doc 1000 duplicates
    // doc 1's text (delta loses to a vintage winner); doc 4 was already
    // contaminated by the vintage eval; doc 5 gates out (< 5 tokens).
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "src1"),
      (2L, "one two three four five six", "src1"),
      (3L, "eval aaa bbb ccc ddd eee", "src0"),
      (4L, "contains eval aaa bbb ccc overlap", "src1"),
      (5L, "tiny doc here", "src1"),
      (1000L, "alpha beta gamma delta epsilon zeta", "src2"),
      (1001L, "seven eight nine ten eleven twelve", "src2"),
      (1002L, "alpha beta gamma zzz yyy xxx", "src0"))
    docs.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val p4 = SparkEntry.queries("p4_incremental_pretrain")(spark, dir).collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSeq
    val p2 = SparkEntry.queries("p2_pretrain_shards")(spark, dir).collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSeq
    assert(p4 == p2, s"maintained $p4 != recompute $p2")
    // The surviving corpus is exactly {2, 1001}: md5 nibbles put doc 2 in
    // shard c (12) and doc 1001 in shard b (11). Doc 1 shares shard c —
    // without the retro retraction shard 12 would report TWO docs.
    assert(p4 == Seq((11, 1L, 6L, 34L), (12, 1L, 6L, 27L)),
      s"got ${p4.mkString("; ")}")
  }

  test("t30 classifies shards new/grown/unchanged and flags displaced endpoints") {
    val dir = java.nio.file.Files.createTempDirectory("pipeops").toString
    import spark.implicits._
    // md5 first nibbles: 0→c 8→c 3→e 997→e 1000→a 1003→a. Key span 0..1003
    // ⇒ vintage cutoff 501: shard c is all-vintage (unchanged), shard a is
    // all-delta (new), shard e gains doc 997 next to vintage doc 3 (grown,
    // and the singleton endpoint pair must move).
    Seq((0L, "a b"), (8L, "c"), (3L, "d e f"), (997L, "g"),
        (1000L, "h i"), (1003L, "j"))
      .map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("t30_shard_diff")(spark, dir).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getLong(2), x.getLong(3),
        x.getInt(5))).toSeq
    assert(r == Seq(
      (10, "new", 2L, 3L, 0),        // shard a: docs 1000,1003 (2+1 tokens)
      (12, "unchanged", 0L, 0L, 0),  // shard c: docs 0,8 untouched
      (14, "grown", 1L, 1L, 1)),     // shard e: doc 997 joins doc 3
      s"got ${r.mkString("; ")}")
  }
}
