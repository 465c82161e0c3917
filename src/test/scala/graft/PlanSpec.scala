package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan hygiene (the 100 TB questions): broadcast joins for dims,
  * filter pushdown and column pruning into the parquet scan, whole-stage
  * codegen around the native vec_dot expression. */
class PlanSpec extends SparkTestBase {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  test("q62: z-ordered scan prunes most of the corpus on a 2-dim corner slab") {
    // The layout's observable effect at the SCAN, not just in footers
    // (FormatsSpec pins those): execute q62 and read the parquet scan's
    // emitted-row metric — rows surviving footer/row-group pruning under
    // the two pushed range filters. On the z-ordered layout the 5%-per-dim
    // corner slab must prune away at least half the corpus at the scan
    // (measured ~3% emitted at this SF; the bound is slack for stat-
    // granule variance), and the filters must actually reach parquet
    // (PushedFilters shows both LessThanOrEqual) — without pushdown the
    // metric would count every row and the layout would be decorative.
    val df = SparkEntry.queries("q62_zorder_scan")(spark, sf)
    val out = df.collect()
    // returns one entry per parquet scan node found — an EMPTY list means
    // the metric hookup broke (DSv2 node, renamed metric), which must
    // FAIL, not read as perfect pruning (review-caught vacuous pass)
    def scanned(p: org.apache.spark.sql.execution.SparkPlan): Seq[Long] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scanned(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scanned(q.plan)
      case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
        sc.metrics.get("numOutputRows").map(_.value).toSeq
      case other => other.children.flatMap(scanned)
    }
    val scans = scanned(df.queryExecution.executedPlan)
    assert(scans.nonEmpty,
      "no FileSourceScanExec numOutputRows metric found - scan hookup broke")
    val scanRows = scans.sum
    val li = graft.Tables.lineitem(spark, sf)
    val corpus = li.count()
    // the layout is lossless: the slab's row count agrees with the PLAIN
    // layout (the oracle's side of the gate, re-derived here)
    val r = li.agg(org.apache.spark.sql.functions.max(col("l_partkey")),
      org.apache.spark.sql.functions.max(col("l_orderkey"))).collect()(0)
    val expect = li.filter(col("l_partkey") <= r.getLong(0) / 20 &&
      col("l_orderkey") <= r.getLong(1) / 20).count()
    assert(out.map(_.getLong(1)).sum == expect,
      s"z-layout slab rows ${out.map(_.getLong(1)).sum} != plain $expect")
    // the skip: the 5%-per-dim corner prunes at least half the corpus at
    // the scan (scanRows can legitimately be 0 when every row group's
    // envelope misses the corner — perfect pruning, not a missing metric)
    assert(scanRows * 2 < corpus,
      s"z-ordered corner scan emitted $scanRows of $corpus rows - no skip")
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("LessThanOrEqual(l_partkey") &&
      plan.contains("LessThanOrEqual(l_orderkey"),
      s"range filters must push into the parquet scan:\n${plan.take(3000)}")
  }

  test("q10_scale: bucketed fact join has no Exchange and no Sort on either side") {
    // The layout twin's whole point: the orders⋈lineitem join must read
    // pre-bucketed, pre-sorted files — the only Exchange in the plan is
    // the 5-group aggregation above the join. Broadcast and AQE are
    // disabled so the planned tree is the bucketed SMJ path and the
    // subtree check can traverse a plain physical plan.
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q10_scale")(spark, sf)
      val plan = df.queryExecution.executedPlan
      val smjs = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
      assert(smjs.nonEmpty,
        s"expected a sort-merge join over bucketed facts:\n${plan.toString.take(3000)}")
      smjs.foreach { j =>
        j.children.foreach { side =>
          assert(side.collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }.isEmpty,
            s"bucketed join side must not shuffle:\n${side.toString.take(2000)}")
          assert(side.collect {
            case so: org.apache.spark.sql.execution.SortExec => so }.isEmpty,
            s"bucketed+sorted join side must not re-sort:\n${side.toString.take(2000)}")
        }
      }
      assert(df.count() == 5)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("legacy bucketedTableScan.outputOrdering still guards multi-file buckets (SPARK-24528)") {
    // bucketedTable() flips spark.sql.legacy.bucketedTableScan.outputOrdering
    // on session-wide. That is safe on 4.1.2 ONLY because FileSourceScan
    // still verifies every bucket holds exactly one file before claiming a
    // sort order (verified against the bytecode) — a Spark upgrade that
    // drops the guard would silently reintroduce the SPARK-24528
    // wrong-results class for any OTHER multi-file bucketed table read in
    // the same session. Pin the guard: a deliberately multi-file-per-bucket
    // table joined on its bucket key must STILL get a Sort on each side
    // even with the legacy conf on. If this test ever fails after a Spark
    // bump, scope the conf to q10_scale's execution instead.
    val tbl = "graft_multifile_bucket_pin"
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    val prevO = spark.conf.getOption("spark.sql.legacy.bucketedTableScan.outputOrdering")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      // 4 writer tasks x 2 buckets -> up to 4 files per bucket.
      spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS v")
        .repartition(4)
        .write.bucketBy(2, "k").sortBy("k").mode("overwrite").saveAsTable(tbl)
      val filesPerBucket = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), tbl)
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(filesPerBucket > 2, s"fixture must be multi-file ($filesPerBucket files, 2 buckets)")
      val a = spark.table(tbl)
      val b = spark.table(tbl).withColumnRenamed("v", "v2")
      val plan = a.join(b, "k").queryExecution.executedPlan
      val smjs = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
      assert(smjs.nonEmpty, s"expected SMJ:\n${plan.toString.take(2000)}")
      smjs.foreach { j =>
        j.children.foreach { side =>
          assert(side.collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }.isEmpty,
            s"bucketed side must still avoid the shuffle:\n${side.toString.take(1500)}")
          assert(side.collect {
            case so: org.apache.spark.sql.execution.SortExec => so }.nonEmpty,
            "multi-file buckets claimed a sort order under the legacy conf — " +
              "the SPARK-24528 guard is gone; scope the conf to q10_scale:\n" +
              side.toString.take(1500))
        }
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
      prevO match {
        case Some(v) => spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", v)
        case None => spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      }
    }
  }

  test("q11 dimension joins broadcast (no shuffle of nation/region)") {
    val plan = planOf("q11_join_dims")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), "dim join must not sort-merge")
  }

  test("filter pushdown reaches the parquet scan") {
    val df = Tables.orders(spark, sf).filter(col("o_totalprice") > 300000)
      .select("o_orderkey")
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,300000.0)]"),
      plan)
  }

  test("column pruning: 2-column projection reads a 2-column schema") {
    val df = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"), readSchema)
  }

  test("s1_knn_brute broadcasts the query side") {
    val plan = planOf("s1_knn_brute")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("vec_dot stays inside whole-stage codegen") {
    import graft.functions.VecFunctions.vec_dot
    val df = Tables.embeddings(spark, sf)
      .select(vec_dot(col("embedding"), col("embedding")).as("sq"))
    val plan = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    // codegen'd operators carry the `*(stageId)` prefix in simple mode
    assert(plan.contains("*(1) Project [vec_dot"), plan)
    // and the codegen result matches the interpreted HOF fold bit-for-bit
    val hof = Tables.embeddings(spark, sf).select(
      expr("aggregate(transform(embedding, x -> cast(x AS double) * cast(x AS double)), 0D, (acc, x) -> acc + x)").as("sq"))
    val a = df.collect().map(_.getDouble(0))
    val b = hof.collect().map(_.getDouble(0))
    assert(a.sameElements(b))
  }

  test("ivec_dot stays inside whole-stage codegen and is exactly the integer fold") {
    import graft.functions.VecFunctions.ivec_dot
    val df = spark.range(3).selectExpr(
        "array(cast(id AS int), cast(id + 1 AS int), 127) AS a",
        "array(2, cast(-id AS int), 127) AS b")
      .select(ivec_dot(col("a"), col("b")).as("d"))
    val plan = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(plan.contains("*(1) Project [ivec_dot"), plan)
    val got = df.collect().map(_.getLong(0)).toSeq
    // id=0: 0+0+16129; id=1: 2-2+16129; id=2: 4-6+16129
    assert(got == Seq(16129L, 16129L, 16127L), got)
  }

  test("q1_agg aggregation is partial+final hash aggregate") {
    val plan = planOf("q1_agg")
    assert(plan.contains("HashAggregate"))
  }

  test("rolling_min_hash stays inside whole-stage codegen") {
    import graft.functions.RollingHashFunctions.rolling_min_hash
    val df = Tables.documents(spark, sf)
      .select(rolling_min_hash(col("text"), 32).as("fp"))
    val plan = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(plan.contains("*(1) Project [rolling_min_hash"), plan)
  }

  test("ANN scale paths: s4 broadcasts probes, d7 bucket join is equi (no cartesian)") {
    val s4 = planOf("s4_knn_ivf")
    assert(s4.contains("BroadcastHashJoin") || s4.contains("BroadcastExchange"), s4.take(3000))
    assert(!s4.contains("CartesianProduct"), "IVF candidate join must not be a cartesian")
    val d7 = planOf("d7_embedding_neardup_lsh")
    assert(!d7.contains("CartesianProduct") && !d7.contains("BroadcastNestedLoopJoin"),
      "LSH bucket join must be a hash-keyed equi-join")
  }

  test("q17 theta join: BNLJ with a broadcast (bounded) build side") {
    // A pure theta join has no equi-key — BNLJ is inherent. What must hold
    // at scale: both sides are pre-filtered (pushdown) to ≤ 40 keys and the
    // build side arrives broadcast, so the loop is bounded × bounded, never
    // corpus × corpus.
    val plan = planOf("q17_theta_join")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("BroadcastExchange"), "build side must be broadcast")
    assert(!plan.contains("CartesianProduct"), "theta join must not fall back to cartesian")
    // the ≤ 40 filter reaches both parquet scans
    assert("PushedFilters: \\[.*LessThanOrEqual\\(p_partkey,40\\)".r
      .findAllIn(plan).size == 2, plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("saltedJoin shape: replicated side broadcast-or-shuffled equi-join, no explosion") {
    import graft.operators.Skew
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    def cust = Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey")
    val joined = Skew.saltedJoin(o, cust, "o_custkey", salts = 4)
    val plan = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // equi-join on (key, salt) — hash-keyed, never nested-loop/cartesian
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin")
      || plan.contains("ShuffledHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // replication is bounded: salts × small side, and the join result equals
    // the unsalted join — no post-join row explosion
    val direct = o.join(cust, "o_custkey").count()
    assert(joined.count() == direct)
  }

  test("GraftExtensions exposes the native functions to SQL") {
    graft.plans.GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       ivec_dot(array(1, 2), array(3, 4)) AS di,
        |       poly_hash('abc') AS ph,
        |       rolling_min_hash('abcdef', 3) AS rmh,
        |       sign_pack(array(CAST(1 AS FLOAT), CAST(-2 AS FLOAT),
        |                       CAST(0 AS FLOAT), CAST(0.5 AS FLOAT))) AS sp""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == 11L)
    assert(r.getLong(4) == 9L, "bits 0 and 3 set (x > 0 strictly)") // 1001b
    assert(r.getLong(2) ==
      graft.functions.RollingHashKernel.fullHash(
        org.apache.spark.unsafe.types.UTF8String.fromString("abc")))
    assert(r.getLong(3) ==
      graft.functions.RollingHashKernel.minWindowHash(
        org.apache.spark.unsafe.types.UTF8String.fromString("abcdef"), 3))
    // the extension class itself installs without error (deploy-time path)
    new graft.plans.GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // sketch aggregates on the SQL surface: exact in the sub-capacity
    // regime, composable with builtin aggregation syntax
    val sk = spark.sql(
      """SELECT kmv_ndv(kmv_sketch(h)) AS ndv,
        |       topk_freq(k)[0].key AS top_key, topk_freq(k)[0].cnt AS top_cnt
        |FROM (SELECT xxhash64(id % 100) AS h, id % 7 AS k
        |      FROM range(10000))""".stripMargin).collect()(0)
    assert(sk.getDouble(0) == 100.0, s"kmv_ndv exact regime: ${sk.getDouble(0)}")
    // ids 0..9999 mod 7: residues 0..3 appear 1429 times, 4..6 1428;
    // ties break by key asc so the top entry is key 0 with 1429.
    assert(sk.getLong(1) == 0L && sk.getLong(2) == 1429L,
      s"topk_freq top entry: ${sk.getLong(1)} x ${sk.getLong(2)}")
    // quantile sketches on the SQL surface: the struct output composes
    // with pct_from_sketch, exact below cap (0..9999 → p50 = 4999.5),
    // and the weighted form reproduces the replicated multiset (values
    // 0..99 each with weight = value → p50 of sum(w)=4950 repeats).
    val pq = spark.sql(
      """SELECT pct_from_sketch(s.vs, s.ws, 0.5D) AS p50,
        |       pct_from_sketch(w.vs, w.ws, 0.5D) AS wp50
        |FROM (SELECT pct_sketch(CAST(id AS DOUBLE)) AS s FROM range(10000)),
        |     (SELECT pct_sketch_w(CAST(id AS DOUBLE), id) AS w FROM range(100))""".stripMargin)
      .collect()(0)
    assert(pq.getDouble(0) == 4999.5, s"pct_sketch SQL p50: ${pq.getDouble(0)}")
    // null sketches (an outer join against a sketch-less group) propagate
    // null through BOTH estimators instead of NPEing (r11 advice).
    val nn = spark.sql(
      "SELECT kmv_ndv(CAST(NULL AS ARRAY<BIGINT>)) AS a, " +
        "pct_from_sketch(CAST(NULL AS ARRAY<DOUBLE>), CAST(NULL AS ARRAY<BIGINT>), 0.5D) AS b")
      .collect()(0)
    assert(nn.isNullAt(0) && nn.isNullAt(1), s"null-sketch estimators: $nn")
    // replicated multiset of 4950 values; rank 2474.5 falls inside the
    // run of 70s (cumulative through 69 is 2415, through 70 is 2485)
    assert(pq.getDouble(1) == 70.0, s"pct_sketch_w SQL p50: ${pq.getDouble(1)}")
  }

  test("e10 resample: grid side broadcast, fact agg is the single hash shuffle") {
    // The minute grid (distinct event_types × slots) must arrive at the
    // left-outer join broadcast — shuffling the FACT side onto the grid
    // would move the 100 TB side for the benefit of the small one.
    val plan = planOf("e10_resample_ffill")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftOuter"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), "grid join must not sort-merge the fact side")
    // Exactly two hash shuffles: the grid's distinct(event_type) and the
    // per-(window, event_type) aggregation. The ffill window's distribution
    // is satisfied without an extra hash exchange.
    assert("hashpartitioning\\(".r.findAllIn(plan).size == 2,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
  }

  test("t9 vocab: corpus size N is a broadcast scalar, one word shuffle") {
    val plan = planOf("t9_vocab_idf")
    // N joins on as a 1-row broadcast (BNLJ over IdentityBroadcastMode) —
    // never a shuffle of the vocabulary against a scalar.
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert("hashpartitioning\\(word".r.findAllIn(plan).size == 1,
      "exactly one groupBy(word) shuffle expected")
    // Both t9 branches prune to at most the validity-filter columns
    // (doc_id, text) — neither the words branch nor the N-count branch
    // needs lang/source/n_chars, so EVERY documents ReadSchema line must
    // exclude them. (An `exists` here would be vacuous: the words branch
    // always yields a doc_id/text-only line regardless of count-branch
    // pruning.)
    assert(plan.linesIterator.filter(_.contains("ReadSchema: struct<")).forall { l =>
      !l.contains("lang") && !l.contains("source") && !l.contains("n_chars")
    }, plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n"))
  }

  test("e11 event-time RANGE frame: single user_id shuffle feeds both windows") {
    val plan = planOf("e11_range_frame")
    assert(plan.contains("RangeFrame"), plan.take(3000))
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size == 1,
      "both window passes must reuse one hashpartitioning(user_id) exchange")
  }

  test("d8 decontamination: train side reduced to a set before a hash join") {
    val plan = planOf("d8_decontaminate")
    // Membership join against the DISTINCT train shingle set — an equi
    // hash join, never a doc-pair product.
    assert(plan.contains("BroadcastHashJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "membership join must stay hash-keyed")
    // The split predicates sit BELOW the typed shingle maps and reach the
    // parquet scans: one pushed EqualTo(source,src0), one pushed Not().
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("EqualTo(source,src0)") && pushed.contains("Not(EqualTo(source,src0))"), pushed)
  }

  test("t11 quota sampling: rk filter becomes a WindowGroupLimit (top-K heap)") {
    // Without this rewrite each source partition is fully sorted to rank
    // ALL rows before the rk <= K filter discards them — at 100 TB that is
    // the difference between a K-row heap per task and a corpus sort.
    val plan = planOf("t11_stratified_sample")
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
  }

  test("q43 LATERAL decorrelates to a ranked join (no per-row re-execution)") {
    // The correlated ORDER BY ... LIMIT subquery must compile to the same
    // single-shuffle WindowGroupLimit shape as the window form (q20) — a
    // nested-loop per outer row would be quadratic at scale.
    val plan = planOf("q43_lateral")
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "lateral must not plan as a nested loop")
  }

  test("d10 incremental dedup: split predicates reach the scans, equi joins only") {
    val plan = planOf("d10_incremental_dedup")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "band-bucket and rejoin must stay hash-keyed")
    // Both split predicates sit BELOW the typed shingle map, at the scan
    // (modulo isn't a parquet-pushable filter, so it appears as a scan-level
    // DataFilter, not in PushedFilters — the point is each branch shingles
    // only its own slice, not the whole corpus twice).
    val belowMap = plan.split("MapPartitions|DeserializeToObject").drop(1).mkString("\n")
    assert(belowMap.contains("% 5"), plan.take(3000))
    assert(belowMap.contains("NOT "), plan.take(3000))
  }

  test("s3 typed Aggregator compiles to partial+final aggregation") {
    val plan = planOf("s3_label_median_norm")
    // Two aggregate operators (partial on the map side, final after the
    // shuffle) — the Aggregator shuffles buffers, not raw rows.
    assert("(?s)Aggregate.*Exchange.*Aggregate".r.findFirstIn(plan).nonEmpty, plan.take(3000))
  }

  test("s5 centroid outliers: map-side component sums, centroid broadcast back") {
    val plan = planOf("s5_centroid_outliers")
    // The posexplode feed must partial-aggregate before its shuffle — the
    // exchange carries (#labels × dim × #partitions) partials, not N×dim rows.
    assert(plan.contains("partial_sum"), plan.take(3000))
    // The (#labels × dim) centroid table returns to the corpus broadcast;
    // shuffling the 100 TB embedding side onto it would be the wrong join.
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), "centroid join must broadcast")
  }

  test("t13 repetition: zero hash shuffles — trigram multisets stay in their document") {
    val plan = planOf("t13_repetition")
    assert(!plan.contains("hashpartitioning("),
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
  }

  test("e12 rolling distinct: dedup happens on (hour,user) pairs BEFORE the unroll") {
    val plan = planOf("e12_rolling_distinct")
    // First shuffle keys on the deduped (h, user_id) pair — raw events never
    // cross the wire three times; the Generate is the 3-window unroll.
    assert("hashpartitioning\\(h#\\d+, user_id".r.findFirstIn(plan).nonEmpty,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
    assert(plan.contains("Generate"), plan.take(3000))
    assert("hashpartitioning\\(".r.findAllIn(plan).size == 3,
      "expected exactly dedup + distinct-partial + final-count shuffles")
  }

  test("e13 gap stats: one user_id exchange feeds both the lag window and the agg") {
    val plan = planOf("e13_gap_stats")
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size == 1,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
  }

  test("e15 outliers: stats broadcast back, one event_type agg shuffle") {
    val plan = planOf("e15_value_outliers")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), "the event stream must not shuffle onto the tiny stats table")
    assert("hashpartitioning\\(event_type".r.findAllIn(plan).size == 1,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
  }

  test("t14 bigram novelty: hash-keyed joins only, partial aggs present") {
    val plan = planOf("t14_bigram_novelty")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "DF rejoin must stay keyed on the bigram")
    assert(plan.contains("partial_count"), "DF count must map-side combine")
  }

  test("e14 funnel: three chained windows + collapse share one user_id exchange") {
    val plan = planOf("e14_funnel")
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size == 1,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
    assert(!plan.contains("Join"), "the one-pass funnel must not become a self-join chain")
  }

  test("e18 interval union: islands, intervals and final agg share one user_id exchange") {
    val plan = planOf("e18_interval_union")
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size == 1,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
    assert(!plan.contains("Join"), "interval union must not become a self-join")
  }

  test("q47 groupwise filter plans as one o_custkey window exchange, not a re-scan join") {
    val plan = planOf("q47_above_group_avg")
    assert("hashpartitioning\\(o_custkey".r.findAllIn(plan).size == 1,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
    assert(!plan.contains("Join"), "groupwise filter must not plan as a correlated self-join")
  }

  test("t15 blocklist scrub is a pure narrow scan+project (zero hash shuffles)") {
    val plan = planOf("t15_blocklist_scrub")
    assert(!plan.contains("hashpartitioning("),
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"scan must prune to (doc_id, text): $readSchema")
  }

  test("d12 chunk dedup: hash-keyed count + rejoin, map-side partials, no pair product") {
    val plan = planOf("d12_chunk_dedup")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "chunk-count rejoin must stay keyed on the chunk hash")
    assert(plan.contains("partial_count"), "chunk counting must map-side combine")
  }

  test("s6 centroid matrix: pairwise join runs on the materialized tiny table only") {
    // centroidVecs is localCheckpoint'd, so the k² pairwise theta-join must
    // read the (#labels × dim) RDD twice — NOT re-scan the corpus parquet
    // per side.
    val plan = planOf("s6_centroid_sim")
    assert(!plan.contains("FileScan"),
      "pairwise stage must not re-scan the embeddings parquet")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("e17 retention: distinct-user partials present, cohort sizes broadcast") {
    val plan = planOf("e17_retention")
    assert(plan.contains("count(distinct user_id"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("p1 pipeline fuses: dedup is a partial WindowGroupLimit, 3 exchanges, no joins") {
    val plan = planOf("p1_e2e_pipeline")
    // rn=1 must rewrite to the map-side-limited WindowGroupLimit — the
    // dedup exchange then carries one row per text, not the gated corpus.
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
    assert("hashpartitioning\\(".r.findAllIn(plan).size == 3,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
    assert(!plan.contains("Join"), "pipeline must stay join-free")
  }

  test("e21 streaks: change-flag, run rollup, argmax and run-count share one user_id exchange") {
    val plan = planOf("e21_streaks")
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size == 1,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
    assert(!plan.contains("Join"), "streak detection must not plan as a self-join")
  }

  test("e22 spearman: both rank windows and the agg share one event_type exchange") {
    val plan = planOf("e22_spearman")
    assert("hashpartitioning\\(event_type".r.findAllIn(plan).size == 1,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
    assert(!plan.contains("Join"), "rank correlation must not plan as a rank self-join")
  }

  test("q51 filtered agg: five conditional measures in ONE scan + one agg shuffle") {
    val plan = planOf("q51_filtered_agg")
    assert("hashpartitioning\\(l_linestatus".r.findAllIn(plan).size == 1,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      "conditional sums must map-side combine")
    assert(!plan.contains("Join"), "FILTER measures must not fan out into per-predicate scans")
    // One scan of lineitem, not one per measure.
    assert(plan.linesIterator.count(_.contains("lineitem.parquet")) <= 2, // formatted plan repeats the path in scan + location lines
      plan.linesIterator.filter(_.contains("lineitem.parquet")).mkString("\n"))
  }

  test("q52 mode: the argmax window sees pre-aggregated (group,value) counts, not raw rows") {
    val plan = planOf("q52_mode")
    assert(plan.contains("partial_count"), "value counting must map-side combine")
    assert(!plan.contains("Join"), "mode must not plan as a counts self-join")
    // Two keyed exchanges: the (status, priority) count and the status window.
    assert("hashpartitioning\\(o_orderstatus".r.findAllIn(plan).size == 2,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
  }

  test("d16 source overlap: capped postings expansion, no shingle self-join, sizes broadcast") {
    val plan = planOf("d16_source_overlap")
    assert(!plan.contains("CartesianProduct"), "no unkeyed pair product")
    // The fractional DF cap (r11) rides the plan as a 1-row broadcast
    // scalar (t9's corpus-N pattern) — a Cross BuildRight BNLJ of one row
    // is that attachment, not a pair product; any OTHER BNLJ shape is
    // still a bug.
    // Tree section only: the formatted details repeat the node name bare.
    val tree = plan.split("\n\n").head
    assert("BroadcastNestedLoopJoin(?! Cross BuildRight)".r.findFirstIn(tree).isEmpty,
      s"only the 1-row cap/size broadcast may nest-loop:\n$tree")
    // The DF-capped postings form generates source pairs by exploding each
    // shingle's source set — the ONLY joins in the plan are the two
    // broadcast attachments of the per-source sizes (one row per source).
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "pair generation must be postings expansion, not a shingle-keyed self-join")
    assert(plan.contains("BroadcastHashJoin"),
      "per-source set sizes (one row per source) must broadcast onto the pair counts")
  }

  test("q2_scale: per-column two-level distincts, no Expand, 3-row merges broadcast") {
    val plan = planOf("q2_scale")
    // The whole point of the twin: the built-in multi-distinct's 3× Expand
    // (tripling every lineitem row through one exchange) must be gone —
    // each column dedups in its own (flag, key) partial-agg pipeline.
    assert(!plan.contains("Expand"), "q2_scale must not plan the Expand rewrite")
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      "the three 3-row per-flag results must meet in broadcast joins")
    // And the built-in q2 DOES expand — the pairing is two physical shapes
    // of one logical answer, not two queries.
    assert(planOf("q2_distinct_agg").contains("Expand"),
      "q2's built-in plan stopped expanding: re-measure whether the twin still pays")
  }

  test("t18 pmi: pair generation is a narrow flatMap; df and N broadcast onto pair counts") {
    // The scale-adaptive parallelized() coalesces this fixture-sized corpus
    // to ONE partition, which legitimately satisfies the groupBy's
    // ClusteredDistribution and elides the pinned exchange. Force the
    // multi-partition geometry so the pin keeps testing the at-scale shape
    // (one shared w1 exchange), not the single-partition degenerate.
    spark.conf.set("graft.parallelize.bytesPerTask", "1024")
    val plan = try planOf("t18_pmi_cooccur")
               finally spark.conf.unset("graft.parallelize.bytesPerTask")
    // Only the scalar N rides a BNLJ (t9's IdentityBroadcastMode pattern);
    // the pair counts and doc frequencies meet in broadcast hash joins.
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), "no pairwise corpus product")
    assert(!plan.contains("SortMergeJoin"),
      "vocab-sized df sides must broadcast, never shuffle the pair counts")
    assert("hashpartitioning\\(w1".r.findAllIn(plan).size >= 1,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
  }

  test("e23 transitions: one user_id exchange for the lag, counts are domain-sized") {
    val plan = planOf("e23_transitions")
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size == 1,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
    assert(plan.contains("partial_count"), "transition counting must map-side combine")
    assert(!plan.contains("Join"), "row-normalization must window the tiny count table, not re-join the corpus")
  }

  test("t19 tfidf: df and N broadcast onto tf; no shuffle of tf against vocab") {
    val plan = planOf("t19_tfidf_terms")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"),
      "the vocab-sized df table must broadcast, never shuffle the tf rows")
    assert(plan.contains("partial_count"), "term counting must map-side combine")
  }

  test("s8 knn accuracy: guarded query broadcast, no corpus self-shuffle") {
    val plan = planOf("s8_knn_accuracy")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the guarded query set must broadcast against the corpus scan (s1's shape)")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan.take(3000))
  }

  test("s12 sq8 recall: stats + query set broadcast, no corpus self-shuffle") {
    val plan = planOf("s12_sq8_recall")
    // The 1-row stats frame and the guarded quantized query set both ride
    // broadcasts (s1/s8's shape); the corpus never sort-merge-joins or
    // cartesians against itself. The only exchange is the q_id window.
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the guarded query set must broadcast against the corpus scan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan.take(3000))
  }

  test("q53 equidepth: boundaries reduce+broadcast — no global-sort ntile single reducer") {
    val plan = planOf("q53_equidepth")
    // The windowless formulation: no Window at all, boundaries ride a
    // 1-row broadcast (BNLJ over IdentityBroadcastMode, t9's pattern).
    assert(!plan.contains("Window"), "equi-depth must not plan as a total-order ntile window")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("partial_percentile") || plan.contains("partial_count"),
      "boundary percentile must map-side combine")
  }

  test("e24 MAD outliers: both stat tables broadcast back, never shuffle the stream") {
    val plan = planOf("e24_mad_outliers")
    // Formatted mode prints each node in the tree AND the detail section —
    // count the numbered detail headers, one per physical node.
    assert("\\(\\d+\\) BroadcastHashJoin".r.findAllIn(plan).size == 2, plan.take(3000))
    assert(!plan.contains("SortMergeJoin"),
      "the |types|-row med/mad tables must broadcast onto the events scan")
  }

  test("q54 salted join: keyed equi-join on (key, salt), no product, no single hot reducer") {
    val plan = planOf("q54_salted_join")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "salting must stay an equi-join on (key, __salt)")
    // The fact side's partitioning must include the salt column.
    assert(plan.contains("__salt"), plan.take(3000))
  }

  test("d17 survivorship: metadata join stays doc_id-keyed, argmax aggregate over cluster rows") {
    val plan = planOf("d17_survivorship")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "the n_chars metadata join must stay keyed on doc_id")
    // r16: the survivor pick is a partial-aggregatable argmax
    // (max(struct(n_chars, -doc_id, doc_id)) + count) — member rows
    // combine map-side before the cluster_id exchange; no window
    // buffering of every member row.
    assert(plan.contains("partial_max"), plan.take(2000))
    assert(!plan.contains(") Window"),
      "the survivor pick must aggregate, not rank over a window")
  }

  test("e25 seasonality: one agg shuffle to domain-sized cells, window over the tiny table") {
    val plan = planOf("e25_seasonality")
    assert(plan.contains("partial_count"), "cell counting must map-side combine")
    assert(!plan.contains("Join"), "row-normalization must window the cell table, not re-join the corpus")
  }

  test("t20 source composition: one agg shuffle, exact token sums, no join") {
    val plan = planOf("t20_source_composition")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      "doc/token counting must map-side combine")
    assert(!plan.contains("Join"), "share normalization must window the cell table")
    // doc_id may appear when the parquet marks it nullable (the validity
    // IsNotNull filter reads it); the payload-irrelevant n_chars must not.
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("n_chars"),
      s"scan must prune n_chars: $readSchema")
  }

  test("q63 profiler: one corpus scan, one agg exchange, no joins") {
    val plan = planOf("q63_table_stats")
    // Ten columns' stats from ONE pass: a single global aggregate whose
    // exchange carries bounded sketch buffers + scalar partials. The
    // unpivot is a literal struct-array explode over the 1-row result.
    assert(!plan.contains("Join"), "profiler must not join")
    assert(plan.linesIterator.count(_.trim.startsWith("Exchange")) <= 1,
      s"profiler must shuffle once (partial->final agg): ${plan.take(3000)}")
    assert(plan.contains("ObjectHashAggregate"),
      "sketch aggregates must build map-side (partial ObjectHashAggregate)")
  }

  test("e27 cdc apply: rank and change-count windows share one user_id exchange") {
    val plan = planOf("e27_cdc_apply")
    assert(plan.linesIterator.count(_.trim.startsWith("Exchange")) <= 1,
      s"the two key windows must share a single user_id exchange: ${plan.take(3000)}")
    assert(!plan.contains("Join"), "snapshot materialization must not join")
  }

  test("s14 rag retrieve: hit set broadcast onto the doc store — documents never shuffle") {
    val plan = planOf("s14_rag_retrieve")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "the (queries x k) hit set must broadcast against the document scan")
    assert(!plan.contains("SortMergeJoin"),
      s"the doc store must not shuffle for a hit-set join: ${plan.take(3000)}")
  }

  test("q64 stats merge: two partition profiles, 1-row broadcast merge, no heavy join") {
    val plan = planOf("q64_stats_merge")
    // Two filtered half-scans each collapse in their own partial->final
    // aggregate; the merge is a 1-row x 1-row broadcast product of
    // summaries. No sort-merge machinery anywhere.
    assert(plan.linesIterator.count(_.trim.startsWith("Exchange")) <= 2,
      s"merge must not add exchanges beyond the two profile aggs: ${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("q55 numeric range frame: both frame aggregates share one o_orderstatus exchange") {
    val plan = planOf("q55_num_range_frame")
    assert("hashpartitioning\\(o_orderstatus".r.findAllIn(plan).size == 1,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
    assert(!plan.contains("Join"), "a value-range frame must not plan as a range self-join")
  }

  test("q55_scale: histogram prefix + marker merge — bucket-keyed window, no pair join") {
    val plan = planOf("q55_scale")
    // r10: edge membership rides the marker-merge Window, partitioned by
    // (status, BUCKET) — domain/width independent sort groups, never the
    // bare-o_orderstatus 3-partition serialization the frame suffers. The
    // histogram prefix window sits behind a localCheckpoint, so exactly
    // ONE Window appears here and it must carry the bucket key.
    assert("\\(\\d+\\) Window".r.findAllIn(plan).size == 1,
      plan.linesIterator.filter(_.contains("Window")).mkString("\n"))
    assert("windowspecdefinition\\(o_orderstatus#\\d+, m_bkt#".r.findFirstIn(plan).isDefined,
      plan.linesIterator.filter(_.contains("windowspecdefinition")).take(4).mkString("\n"))
    // The r7–r9 edge-bucket pair join is GONE: the only joins left are the
    // two prefix broadcasts plus the null/NaN side path's per-status count.
    assert(!plan.contains("ShuffledHashJoin") && !plan.contains("SortMergeJoin"),
      "edge membership must ride the merge window, not a bucketed self-join")
    assert("\\(\\d+\\) BroadcastHashJoin".r.findAllIn(plan).size == 3, plan.take(3000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "band membership must never plan as a theta join")
  }

  test("q46: the NOT IN branch never plans as a null-aware anti join") {
    // Spark's NAAJ broadcasts the ENTIRE subquery (its only physical
    // strategy for nullable NOT IN) — killed live at sf100 (r10). The
    // decomposed form must keep the anti joins plain (shuffle-capable)
    // and the null probe a scan-shaped aggregate.
    val plan = planOf("q46_null_semantics")
    assert(!plan.contains("NAAJ"),
      "NOT IN must stay decomposed (distinct set + null probe + anti join), " +
        "never a null-aware anti join")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.linesIterator.filter(_.contains("Join")).take(6).mkString("\n"))
  }

  test("q7_scale: no buffered percentile aggregate, fine prefix partitioned by coarse bucket") {
    val plan = planOf("q7_scale")
    assert(!plan.toLowerCase.contains("percentile"),
      "the scale twin must not fall back to the value-buffering percentile aggregate")
    assert(!plan.contains("ObjectHashAggregate"),
      "order statistics must ride hash aggregates over the counts table, not object buffers")
    // The fine running total must partition by (flag, cg) — a plain
    // per-flag window would serialize the counts table over |flags|
    // partitions, the wall the twin exists to remove.
    assert("windowspecdefinition\\(l_returnflag#\\d+, cg#".r.findFirstIn(plan).isDefined,
      plan.linesIterator.filter(_.contains("windowspecdefinition")).take(4).mkString("\n"))
  }

  test("d15: medoid argmax rides aggregates — no label-partitioned corpus sort") {
    val plan = planOf("d15_semdedup")
    // r8: the medoid pick is max_by (map-side-combining aggregate); the
    // r7 row_number window partitioned the corpus by label (cardinality
    // 10, fixed) — the e22/q55 serialization shape — and must not return.
    assert("\\(\\d+\\) Window".r.findAllIn(plan).size == 0,
      plan.linesIterator.filter(_.contains("Window")).mkString("\n"))
    assert("\\(\\d+\\) BroadcastHashJoin".r.findAllIn(plan).size >= 1, plan.take(3000))
  }

  test("e22_scale: fine ranks partitioned by (type, bucket), never bare event_type on the fact") {
    val plan = planOf("e22_scale")
    // A windowspecdefinition whose partition list is event_type alone and
    // whose first ORDER key is the raw sort column is e22's full-fact
    // window — the 10-fixed-partition wall the twin exists to remove. The
    // fine windows must carry the coarse bucket in the partition list.
    assert("windowspecdefinition\\(event_type#\\d+, (value|ts)#\\d+".r.findFirstIn(plan).isEmpty,
      plan.linesIterator.filter(_.contains("windowspecdefinition")).mkString("\n"))
    assert("windowspecdefinition\\(event_type#\\d+, gv#".r.findFirstIn(plan).isDefined &&
      "windowspecdefinition\\(event_type#\\d+, gt#".r.findFirstIn(plan).isDefined,
      plan.linesIterator.filter(_.contains("windowspecdefinition")).mkString("\n"))
    // Both coarse prefix tables ride broadcasts back onto the fact.
    assert("\\(\\d+\\) BroadcastHashJoin".r.findAllIn(plan).size == 2, plan.take(3000))
    // r16: the two prefix aggregations are FUSED into one grouping-sets
    // pass materialized before the main query, so the final plan scans
    // the events fact exactly ONCE (sf100 A/B: 4 passes → 2; 66.8 s →
    // 38.8 s ≈ the q1 scan control, zero spill — BENCHNOTES r16).
    assert(plan.split("\n\n").head.linesIterator.count(_.contains("Scan parquet")) == 1,
      plan.linesIterator.filter(_.contains("Scan")).mkString("\n"))
  }

  test("q56 tpch5: dims broadcast, date filter pushed into the orders scan") {
    val plan = planOf("q56_tpch5")
    // nation/region/supplier/customer must all ride broadcast joins; only
    // the fact-key joins may shuffle.
    assert("\\(\\d+\\) BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan.take(3000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(3000))
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      plan.linesIterator.filter(_.contains("PushedFilters")).take(6).mkString("\n"))
  }

  test("s9 triplet mining: guarded query broadcast, single corpus pass for both branches") {
    val plan = planOf("s9_triplet_mining")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the guarded anchor set must broadcast against the corpus scan (s1's shape)")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan.take(3000))
    // One corpus scan feeds the (q_id, same) rank window and the rollup.
    assert(plan.linesIterator.count(_.contains("embeddings.parquet")) <= 4,
      plan.linesIterator.filter(_.contains("embeddings.parquet")).mkString("\n"))
  }

  test("e26 type correlation: corpus collapses in the first agg; pair join is grid-sized") {
    val plan = planOf("e26_type_correlation")
    // The only parquet scan feeds the (hour, type) aggregate; the grid,
    // fill and pair joins all read the checkpointed RDD.
    assert(plan.linesIterator.count(_.contains("events.parquet")) <= 2,
      plan.linesIterator.filter(_.contains("events.parquet")).mkString("\n"))
    assert(!plan.contains("CartesianProduct"),
      "pair alignment must stay keyed on the hour (the type grid rides broadcast)")
  }

  test("mm6 storage profile: one source-keyed agg, media bytes never shuffle") {
    val plan = planOf("mm6_storage_profile")
    assert("hashpartitioning\\(source".r.findAllIn(plan).size == 1,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
    assert(plan.contains("partial_count") || plan.contains("partial_percentile"),
      "the size stats must map-side combine")
  }

  test("q48 bloom pruning is conservative and actually prunes") {
    import org.apache.spark.sql.functions.col
    // No false negatives: the pruned join equals the plain join exactly.
    val pruned = SparkEntry.queries("q48_bloom_prune_join")(spark, sf)
    val plain = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).filter(col("c_acctbal") > 9000),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("c_acctbal"))
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    // And the probe rejects most non-matching fact rows (fpp 0.01 — allow
    // generous slack): the pruned fact side must be far below the full scan.
    val rich = Tables.customer(spark, sf).filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_acctbal"))
    val bloom = rich.stat.bloomFilter("c_custkey", 10000, 0.01)
    val total = Tables.orders(spark, sf).count()
    val kept = Tables.orders(spark, sf).select(col("o_custkey"))
      .collect().count(r => bloom.mightContain(r.getLong(0)))
    val matching = Tables.orders(spark, sf)
      .join(rich, col("o_custkey") === col("c_custkey")).count()
    assert(kept >= matching, "bloom must never drop a true match")
    assert(kept < total, s"bloom kept $kept of $total fact rows — no pruning happened")
  }

  test("q57/q59: sketches build map-side; the exchange carries buffers, not rows") {
    // The whole point of the sketch aggregates is the shuffle contract:
    // partial ObjectHashAggregate BELOW the exchange (bounded buffers per
    // partition per group cross the wire), final aggregate above, hashing
    // codegen'd in the scan-side project — never a row-level distinct
    // exchange (q2's Expand wall) or a sort-based fallback.
    for (q <- Seq("q57_kmv_distinct", "q59_heavy_hitters", "t8_scale",
        "q60_pct_sketch", "q61_weighted_pct")) {
      val plan = planOf(q)
      assert(plan.toLowerCase.contains("partial_kmvsketch") ||
          plan.toLowerCase.contains("partial_spacesavingtopk") ||
          plan.toLowerCase.contains("partial_pctsketch"),
        s"$q: sketch must aggregate partially below the exchange\n" + plan.take(1500))
      assert("\\(\\d+\\) ObjectHashAggregate".r.findAllIn(plan).size == 2,
        s"$q: expected partial+final ObjectHashAggregate pair\n" + plan.take(1500))
      assert(!plan.contains("Expand"), s"$q must not fall back to the Expand plan")
      assert(!plan.contains("SortAggregate"), s"$q: object hash agg must not sort-fall-back")
    }
    // The pairwise queries checkpoint their sketch table first (one corpus
    // pass — the aggregate runs inside the eager checkpoint, not in this
    // plan), so the final plan must be a broadcast pair join over the
    // materialized |groups|-row table: no corpus re-scan, no re-aggregate,
    // no shuffled join.
    for (q <- Seq("q58_kmv_set_ops", "d16_scale")) {
      val plan = planOf(q)
      assert(plan.contains("Scan ExistingRDD"),
        s"$q: pair join must read the checkpointed sketch table\n" + plan.take(1500))
      assert(!plan.contains("ObjectHashAggregate") && !plan.contains("Scan parquet"),
        s"$q: the self-join must not re-sketch the corpus\n" + plan.take(1500))
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"$q: the tiny pair join must broadcast\n" + plan.take(1500))
    }
  }

  test("e29 scd2: run detection, run rollup and effectivity share ONE user_id exchange") {
    val plan = planOf("e29_scd2")
    // row_number/lag, the running change-sum, the (user, ver) SortAggregate
    // AND the lead() window all reuse the single user_id partitioning.
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size == 1,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
    assert(!plan.contains("Join"), "gaps-and-islands must not plan as a self-join")
  }

  test("e30 cusum: grid-sized windows after one agg; argmax is a WindowGroupLimit") {
    val plan = planOf("e30_cusum")
    // one (type, hour) aggregate exchange + one event_type exchange shared
    // by the overall-mean, running-sum and rank windows
    assert("hashpartitioning\\(".r.findAllIn(plan).size == 2,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
    assert(plan.contains("WindowGroupLimit"),
      "rk = 1 must run as a top-1 heap, not a full per-type sort retention")
    assert(plan.contains("partial_sum"), "hourly totals must map-side combine")
  }

  test("q66 entity match: block-keyed equi-join; levenshtein only in the residual") {
    val plan = planOf("q66_entity_match")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "the blocking key must keep the self-join equi — never all-pairs\n" + plan.take(2000))
    // the bound edit distance must be a post-block residual condition, not
    // a join key (it can't hash) and not a separate filter over a product
    assert(plan.contains("levenshtein"), plan.take(2000))
    assert("Left keys.*blk".r.findFirstIn(plan).nonEmpty ||
      "hashpartitioning\\([^)]*blk".r.findFirstIn(plan).nonEmpty,
      "block prefix must be part of the join key\n" +
        plan.linesIterator.filter(l => l.contains("keys") || l.contains("hashpartitioning"))
          .mkString("\n"))
  }

  test("t24 surprisal: corpus tokenized ONCE (tf materialized for its three consumers)") {
    val plan = planOf("t24_unigram_surprisal")
    // one Generate (explode) over one documents scan; word totals, corpus
    // total and per-doc scoring read the checkpointed tf table
    assert("Scan parquet".r.findAllIn(plan).size <= 2, // tokenize + doc_id spine
      s"documents must not be re-tokenized per consumer\n" + plan.take(1500))
    assert(!plan.contains("Generate"),
      "the explode must run inside the eager checkpoint, not in this plan")
    assert(plan.contains("Scan ExistingRDD"),
      "consumers must read the materialized tf")
  }

  test("s16 prefix recall: guarded query broadcast; all three rank windows share ONE q_id exchange") {
    // Same single-partition degenerate as t18's pin: force multi-partition
    // geometry so the shared-q_id-exchange property is what's tested.
    spark.conf.set("graft.parallelize.bytesPerTask", "1024")
    val plan = try planOf("s16_prefix_recall")
               finally spark.conf.unset("graft.parallelize.bytesPerTask")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the guarded query set must broadcast against the corpus scan (s1's shape)")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan.take(3000))
    // full/quarter/half rankings and the recall rollup all ride one
    // q_id partitioning — re-exchanging per window would triple the
    // candidate shuffle
    assert("hashpartitioning\\(q_id".r.findAllIn(plan).size == 1,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
  }

  test("q67 join-size estimate: joins see per-key AGGREGATES, never raw rows") {
    val plan = planOf("q67_join_size_est")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // frequency tables map-side combine before any join; the estimate is
    // computed from frequency algebra, not by materializing join rows
    assert(plan.contains("partial_count"), "per-key counting must map-side combine")
    // each base table is scanned exactly once (orders, lineitem, events) —
    // count in the tree section (the details repeat every node name)
    assert("Scan parquet".r.findAllIn(plan.split("\n\n").head).size == 3,
      s"expected exactly 3 base scans:\n${plan.take(1500)}")
  }

  test("e31 rate limit: burst window and per-user rollup share ONE user_id exchange") {
    val plan = planOf("e31_rate_limit")
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size == 1,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
    assert(plan.contains("RangeFrame"),
      "burst counting must be a VALUE-interval frame, not a row frame")
    assert(plan.contains("partial_max"), "the rollup must map-side combine")
    assert(!plan.contains("Join"), "no join anywhere in the audit")
  }

  test("t26 vocab zipf: corpus tokenized once; rank window and rollup reuse the source partitioning") {
    val plan = planOf("t26_vocab_zipf")
    assert("Generate".r.findAllIn(plan.split("\n\n").head).size == 1,
      "documents must be tokenized exactly once")
    // (source,word) counts then source: two keyed exchanges total; the
    // final per-source rollup reuses the window's source partitioning
    assert("hashpartitioning\\(source".r.findAllIn(plan).size == 2,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
    assert(!plan.contains("Join"), "profile must not join the corpus back")
  }

  test("d18 calibration: bounded sample via TakeOrdered heap; pair join broadcasts 128 rows") {
    val plan = planOf("d18_minhash_calibration")
    // the sample must NOT be a global sort of the corpus — per-partition
    // top-N heaps merged on the driver keep it O(N) at any corpus size
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the 128-row pair side must broadcast (inequality join)")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan.take(3000))
  }

  test("mm7 chunk manifest: narrow map + generate — no shuffle, no join, bytes stay put") {
    val plan = planOf("mm7_chunk_manifest")
    val tree = plan.split("\n\n").head
    assert("Generate".r.findAllIn(tree).size == 1, plan.take(1500))
    assert(!plan.contains("hashpartitioning") && !plan.contains("Join"),
      "chunking must not move blob bytes between partitions:\n" +
        plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert("Scan parquet".r.findAllIn(tree).size == 1, "one documents scan")
  }

  test("t25 line filter: one narrow scan, all rules as array HOFs — zero shuffles") {
    val plan = planOf("t25_line_filter")
    val tree = plan.split("\n\n").head
    assert("Scan parquet".r.findAllIn(tree).size == 1, plan.take(1500))
    assert(!plan.contains("Generate") && !plan.contains("Join") &&
      !plan.contains("hashpartitioning"),
      "line filtering must stay a per-row map (explode/join would shuffle " +
        "corpus bytes):\n" + plan.take(2000))
  }

  test("t27 bpe pairs: pair expansion runs on the VOCAB, not the corpus") {
    val plan = planOf("t27_bpe_pairs")
    val tree = plan.split("\n\n").head
    assert("Scan parquet".r.findAllIn(tree).size == 1, "one documents scan")
    // corpus → word counts (exchange 1), vocab → pair counts (exchange 2);
    // the rank window sorts ≤26² aggregated rows
    assert("hashpartitioning\\((word|pair)".r.findAllIn(plan).size == 2,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
    // the second Generate's input is the aggregated vocab table: it must
    // sit ABOVE the word aggregate in the tree, never on the raw scan
    val genIdx = "Generate".r.findAllIn(tree).size
    assert(genIdx == 2, s"expected tokenize + pair-expand Generates, got $genIdx")
  }

  test("e32 ivm: base and delta aggregate the SAME checkpointed version chain") {
    val plan = planOf("e32_ivm_agg")
    val tree = plan.split("\n\n").head
    // the windowed chain (one user_id exchange) is materialized once;
    // base and delta are aggregates over the checkpoint, not re-scans
    assert(!tree.contains("Scan parquet"),
      "events must not be re-scanned per consumer:\n" + plan.take(1500))
    assert(plan.contains("Scan ExistingRDD"), "consumers read the checkpoint")
    assert(plan.contains("FullOuter"), "base ⊕ delta merges by group")
    assert(plan.contains("partial_sum"), "delta aggregation must map-side combine")
  }

  test("d19 dup weights: both windows share ONE fp exchange; no join-back") {
    val plan = planOf("d19_dup_weights")
    val tree = plan.split("\n\n").head
    assert("Scan parquet".r.findAllIn(tree).size == 1, "one documents scan")
    assert("hashpartitioning\\(fp".r.findAllIn(plan).size == 1,
      "group size and representative rank must reuse one fp partitioning:\n" +
        plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
    assert(!plan.contains("Join"), "weights ride windows, not a join-back")
  }

  test("t28 shard plan: one documents scan, one shard exchange, no window/join") {
    val plan = planOf("t28_shard_plan")
    val tree = plan.split("\n\n").head
    assert("Scan parquet".r.findAllIn(tree).size == 1, "one documents scan")
    assert(!plan.contains("Join"), "manifests come from the aggregate alone")
    assert(!tree.contains("Window"),
      "endpoints ride min/max tags, not a rank window:\n" + tree.take(1200))
    // One hash exchange on shard (the write's own partitioning) — the
    // partial aggregate below it collapses each map task to ≤16 rows.
    assert("hashpartitioning\\(shard".r.findAllIn(plan).size >= 1,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
    assert(plan.contains("partial"), "map-side combine before the exchange")
  }

  test("q69 join ivm: every maintenance join broadcasts; no fact-side shuffle join") {
    val plan = planOf("q69_ivm_join")
    val tree = plan.split("\n\n").head
    // The split is materialized once (e32's checkpoint rule): the final
    // plan must consume ExistingRDD, never re-scan orders/customer per
    // branch — at 100 TB the base branch is the persisted vintage.
    assert(!tree.contains("Scan parquet"),
      "facts must come from the materialized split, not per-branch re-scans:\n" +
        tree.take(1500))
    assert(plan.contains("Scan ExistingRDD"), "consumers read the checkpoint")
    // Bilinear maintenance: base⋈base, Δorders⋈customer, base⋈Δcustomer —
    // three joins, all broadcast AT THIS SF: the delta joins by HINT (the
    // IVM contract — increments are bounded; a shuffle there would mean a
    // fact table exchanged for maintenance, the exact cost IVM avoids),
    // the base join by the planner's threshold (un-hinted on purpose: at
    // 100 TB the base term is the persisted vintage, not a live join, so
    // forcing a 15/16-of-customer broadcast would encode a falsehood).
    assert("BroadcastHashJoin".r.findAllIn(tree).size == 3,
      "expected exactly three broadcast maintenance joins:\n" +
        tree.linesIterator.filter(_.contains("Join")).mkString("\n"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "no shuffle join in the maintenance path")
    // The merge is a union of |groups|-sized aggregate tables re-grouped —
    // each branch map-side combines before its exchange.
    assert(tree.contains("Union"), "base ⊕ deltas merge as a union of aggregates")
    assert(plan.contains("partial_count"), "branch aggregates must map-side combine")
  }

  test("q69_scale: base is a vintage scan; delta branches scan only delta partitions") {
    val plan = planOf("q69_scale")
    val tree = plan.split("\n\n").head
    // The production read path (r16 — the warm pass IS the pinned shape,
    // no localCheckpoint): the base term is a bare |groups|-row read of
    // the persisted vintage aggregate with no join and no fact under it;
    // the fact appears ONLY through the vday-partitioned orders layout,
    // where every branch's time predicate is paid as PARTITION PRUNING
    // at the scan, and ΔC's key cutoff pushes into the customer scan.
    assert(plan.contains("graft_ivm_vintage"),
      "base must read the persisted vintage table")
    assert(!plan.contains("Scan ExistingRDD") && !plan.contains("Checkpoint"),
      "the warm pass materializes nothing — pruned parquet scans only")
    // ΔO: the today-partition scan (vday = 15) — partition filter, so the
    // 15 snapshot days are never opened; O₁: the snapshot scan (vday < 15).
    assert(plan.linesIterator.exists(l => l.contains("PartitionFilters")
        && l.contains("vday") && l.replace(" ", "").contains("=15")),
      "ΔO must prune to the delta partition at the scan:\n" +
        plan.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    assert(plan.linesIterator.exists(l => l.contains("PartitionFilters")
        && l.contains("vday") && l.replace(" ", "").contains("<15")),
      "O₁ must scan only the snapshot partitions:\n" +
        plan.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    // ΔC = customers past the cutoff literal — a pushed footer predicate.
    assert(plan.contains("GreaterThan(c_custkey"),
      "ΔC's cutoff must push into the customer scan:\n" +
        plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    // Three signed maintenance joins — ΔO⁺⋈(C₁∪ΔC), (−1)·P⋈(C₁∪ΔC),
    // O₁⋈ΔC — every one broadcasting its bounded increment side; the
    // base branch contributes NO join at all (q69's base join is gone:
    // it ran yesterday and was persisted).
    assert("BroadcastHashJoin".r.findAllIn(tree).size == 3,
      "expected exactly three broadcast delta joins:\n" +
        tree.linesIterator.filter(_.contains("Join")).mkString("\n"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "no shuffle join in the maintenance path")
    assert(tree.contains("Union"), "vintage ⊕ signed deltas merge as a union")
  }

  test("s20: the probe set prunes the persisted index at the SCAN; the delta cutoff pushes") {
    val plan = planOf("s20_ivf_delta")
    // The cell-partitioned vintage layout is the index: the query's probe
    // union must appear as a PartitionFilters `cell IN (...)` on the
    // vintage scan — the IVF cut paid by partition pruning, not a join or
    // a post-scan filter.
    val vintageScan = plan.linesIterator
      .dropWhile(!_.contains("graft_ann_vintage")).take(12).mkString("\n")
    assert(plan.contains("graft_ann_vintage"), "base must read the persisted index")
    // Catalyst renders the literal probe set as `cell INSET ...` (or
    // `cell IN (...)` for small sets) inside PartitionFilters.
    assert(plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") &&
          (l.contains("cell#") && (l.contains("INSET") || l.contains(" IN ")))),
      "probe set must prune index partitions at the scan:\n" + vintageScan)
    // The delta branch re-encodes ONLY the post-cutoff rows: the vec_id
    // cutoff literal must reach its embedding scan as a pushed filter.
    assert(plan.linesIterator.exists(l =>
        l.contains("PushedFilters") && l.contains("GreaterThan(vec_id")),
      "delta cutoff must push into the embeddings scan:\n" +
        plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "search joins the broadcast probe table only — vectors never shuffle")
  }

  test("q69_scale retraction: phantom-status groups net to zero and vanish") {
    // Yesterday's vintage carries the corrupt sentinel-status shard; the
    // maintained result must contain NO trace of it (the oracle certifies
    // this too — q69's recompute never sees 'X' — but this pins the
    // n_orders > 0 drop as load-bearing rather than vacuous: the vintage
    // parquet itself MUST contain the phantom groups being retracted).
    val out = SparkEntry.queries("q69_scale")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(!out.exists(r => r.getAs[String]("o_orderstatus") == "X"),
      "retracted phantom groups must vanish from the maintained view")
    assert(out.forall(_.getAs[Long]("n_orders") > 0), "no zero rows survive")
    val vdir = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val vintage = spark.read.parquet(
      new java.io.File(vdir, s"graft_ivm_vintage_${graft.Tables.corpusTag(sf)}/base")
        .getAbsolutePath).collect()
    assert(vintage.exists(r => r.getAs[String]("o_orderstatus") == "X"),
      "the persisted vintage must actually contain the phantom groups")
  }

  test("t30 shard diff: only the delta scans parquet, with the vintage cutoff pushed") {
    val plan = planOf("t30_shard_diff")
    val tree = plan.split("\n\n").head
    // Yesterday's manifest is the checkpoint; the one parquet scan left in
    // the final plan is the DELTA side of the fold.
    assert("Scan parquet".r.findAllIn(tree).size == 1,
      "exactly one live documents scan (the delta):\n" +
        tree.linesIterator.filter(_.contains("Scan")).mkString("\n"))
    // The complement predicate NOT(doc_id <= cut) must reach the footer as
    // GreaterThan — the literal-fold pattern (q62) that lets the delta
    // scan prune every already-manifested row group.
    assert(plan.contains("GreaterThan(doc_id"),
      "vintage cutoff must push into the parquet scan:\n" +
        plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    // The diff itself joins two 16-row manifests: broadcast, never an SMJ.
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      "manifest diff must be a broadcast join")
    assert(!tree.contains("Window"), "manifests fold with min/max, not windows")
  }

  test("q70 expectations: single-table checks fan out from aggregates; refs are key-only joins") {
    val plan = planOf("q70_expectations")
    val tree = plan.split("\n\n").head
    // Same-table checks share one multi-count aggregate (the e32 explode
    // fan-out) — the suite is aggregates + two referential LEFT joins,
    // never a window, rank, or cartesian.
    assert(!tree.contains("Window") && !tree.contains("Cartesian"),
      "expectation suite must be pure aggregation:\n" + tree.take(1500))
    assert("LeftOuter".r.findAllIn(tree).size == 2,
      "exactly two referential left joins (orders→customer, lineitem→orders):\n" +
        tree.linesIterator.filter(_.contains("Join")).mkString("\n"))
    assert(plan.contains("partial_count"), "per-table counts must map-side combine")
    // The referential joins carry KEYS only: their scans read just the
    // join column (column pruning), never the fact row.
    val refScans = plan.linesIterator.filter(l =>
      l.contains("ReadSchema") && (l.contains("struct<o_custkey:bigint>") ||
        l.contains("struct<l_orderkey:bigint>"))).size
    assert(refScans >= 2,
      "referential check scans must prune to the key column:\n" +
        plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n"))
  }

  test("s17 hamming rerank: vectors never cross a shuffle; pool cut is a WindowGroupLimit heap") {
    // s18_pq_adc shares the contract: the ADC stage carries CODES (m
    // bytes/vector), the rerank joins embeddings via broadcast id joins —
    // an embedding column in any hashpartitioning is the scale bug.
    // s19_ivfpq extends it: the IVFADC candidate stage carries (cell,
    // codes) with the per-query LUT broadcast — same no-vector-exchange
    // contract through the coarse routing.
    for (name <- Seq("s17_hamming_rerank", "s17_scale", "s18_pq_adc", "s19_ivfpq")) {
      val plan = planOf(name)
      // Shuffle exchanges may carry ids/sigs/hamming/cosine — never an
      // embedding column (broadcasts of the bounded query set are exempt:
      // that is the point of broadcasting it).
      val shuffles = plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n")
      assert(!shuffles.contains("emb"), s"$name: vectors crossed a shuffle:\n" + shuffles)
      assert(plan.contains("WindowGroupLimit"),
        s"$name: hamming pool must cut with a per-task heap, not a full sort")
    }
  }

  /** The global-top-k physical contract (r13 verdict item 3): these queries
    * rank over an UNPARTITIONED window (or a global orderBy+limit), which
    * is a single-reducer full sort unless the optimizer cuts the input
    * map-side. Correct today via WindowGroupLimit / TakeOrderedAndProject —
    * pin it so a Spark upgrade or a query edit (e.g. a non-literal rank
    * bound, which defeats the WindowGroupLimit rewrite — see the red
    * variant below) cannot silently reintroduce the single-reducer sort. */
  private def assertHeapTopK(plan: org.apache.spark.sql.execution.SparkPlan,
      name: String): Unit = {
    import org.apache.spark.sql.execution._
    // A node cuts map-side if, between the global window and the raw
    // input, a heap bounds the rows each task forwards (Sort/Exchange are
    // transparent: they preserve the already-cut row count).
    def cutsMapSide(p: SparkPlan): Boolean = p match {
      case _: TakeOrderedAndProjectExec => true
      case _: window.WindowGroupLimitExec => true
      case s: SortExec => cutsMapSide(s.child)
      case e: exchange.ShuffleExchangeExec => cutsMapSide(e.child)
      case pr: ProjectExec => cutsMapSide(pr.child)
      case _ => false
    }
    val globalWindows = plan.collect {
      case w: window.WindowExec if w.partitionSpec.isEmpty => w }
    globalWindows.foreach { w =>
      assert(cutsMapSide(w.child),
        s"$name: unpartitioned rank window fed by FULL input (single-reducer " +
          s"sort):\n${w.simpleStringWithNodeId()}\n <- ${w.child.getClass.getSimpleName}")
    }
  }

  test("global top-k heaps: q68/q68_scale/s17/s17_scale/d18/q30 all cut map-side") {
    import org.apache.spark.sql.execution._
    def sparkPlanOf(name: String): SparkPlan =
      SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan
    val names = Seq("q68_skew_topkeys", "q68_scale", "s17_hamming_rerank",
      "s17_scale", "d18_minhash_calibration", "q30_topk")
    names.foreach { name =>
      val plan = sparkPlanOf(name)
      assertHeapTopK(plan, name)
      // each of these queries HAS a global top-k — the heap must exist
      // somewhere (guards against the detector trivially passing because
      // the window itself disappeared into something worse).
      assert(plan.collect {
        case t: TakeOrderedAndProjectExec => t
        case g: window.WindowGroupLimitExec => g
      }.nonEmpty, s"$name: no map-side heap operator anywhere in the plan")
    }
    // t8_scale's cut is the sketch itself (slice of a 1-row aggregate) —
    // no rank window may appear at all.
    assert(sparkPlanOf("t8_scale").collect {
      case w: window.WindowExec => w }.isEmpty,
      "t8_scale grew a rank window; its top-k is the MG summary slice")
    // RED variant — prove the detector discriminates: a non-literal rank
    // bound defeats both the WindowGroupLimit and the limit-pushdown
    // rewrites, leaving exactly the single-reducer shape the pin rejects.
    val broken = graft.Tables.orders(spark, sf)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("o_totalprice").desc)))
      .filter(col("rnk") <= col("o_orderkey"))
      .queryExecution.sparkPlan
    assert(broken.collect {
      case w: window.WindowExec if w.partitionSpec.isEmpty => w }.nonEmpty,
      "red variant lost its global window; the pin may have gone vacuous")
    assert(intercept[org.scalatest.exceptions.TestFailedException] {
      assertHeapTopK(broken, "red-variant")
    }.getMessage.contains("red-variant"), "detector failed to flag the red variant")
  }

  test("q68 skew top-keys: reused exchanges feed both consumers; top-10 is a heap") {
    val plan = planOf("q68_skew_topkeys")
    // The total and the top-10 both consume the counts join; at runtime
    // AQE dedupes the identical input shuffles (ReusedExchange appears
    // only in the executed plan, so the static pin is the ABSENCE of the
    // old checkpoint barrier — measured r13-continued-4: this form beats
    // the eager checkpoint 59 vs 89 s at sf100).
    assert(!plan.contains("Scan ExistingRDD"),
      "the checkpoint barrier is gone by design; exchanges reuse at runtime")
    // The global top-10 plans as TakeOrderedAndProject — a per-task heap
    // + 10-row driver merge, strictly better than a rank window (the
    // rnk<=10 filter then runs over 10 rows).
    assert(plan.contains("TakeOrderedAndProject") || plan.contains("WindowGroupLimit"),
      "global top-10 must plan as a heap, not a 1-partition full sort")
    // Joins see per-key aggregates, never raw fact rows (q67's contract).
    assert(plan.contains("partial"), "map-side combine below the count exchanges")
  }

  test("p2 pretrain shards: decontamination is an anti-join; dedup window keys on text") {
    val plan = planOf("p2_pretrain_shards")
    assert(plan.contains("LeftAnti"),
      "contaminated ids must drop via anti-join, never a filter-collect")
    assert("hashpartitioning\\(text".r.findAllIn(plan).size == 1,
      "exact dedup rides ONE text-keyed window exchange:\n" +
        plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
  }

  test("e33 peak concurrency: bucketed prefix sum — no bare event_type sort, broadcast joins only") {
    val plan = planOf("e33_peak_concurrency")
    // Phase-1 sorts partition by (event_type, day) — #types·#days-way
    // parallel. A window exchange on BARE event_type would be the
    // #types-reducer wall this rewrite removed (11.3×/decade at sf10).
    // Direct pin (not a disjunction — r13's guard was vacuous because the
    // bucketed exchange always exists): every FULL-ROW sort — identified
    // by the event_id tie-break key, which only the 2n-row point stream
    // carries — must sort within a (event_type, day) bucket. Bare
    // event_type exchanges DO legitimately remain (the #types·#days-row
    // offsets window and the partial-agg max exchanges move aggregates,
    // never the stream), so the exchange side pins only that the bucketed
    // one exists.
    // (formatted-explain detail lines: sort/window orderings carry ASC and
    // the tie-break column; tree lines carry neither)
    val rowSorts = plan.linesIterator
      .filter(l => l.contains(" ASC") && l.contains("event_id")).toList
    assert(rowSorts.nonEmpty, "phase-1 local prefix sort vanished:\n" + plan)
    assert(rowSorts.forall(s => s.contains("event_type") && s.contains("day")),
      "per-type global full-row sort resurfaced (the #types-reducer wall):\n" +
        rowSorts.mkString("\n"))
    assert("hashpartitioning\\(event_type[^,)]*, day".r.findAllIn(plan).nonEmpty,
      plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
    // Offsets and peaks join back as broadcasts — never a shuffled join
    // of the full delta stream.
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "offset/peak join must broadcast:\n" +
        plan.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }

  test("mm8 frame dedup: exchanges carry digests and counts, never media bytes") {
    val plan = planOf("mm8_frame_dedup")
    // Both shuffles key on frame_hex (digest agg + join back) and the
    // rollup reuses doc_id; media/len must be projected away BEFORE any
    // exchange — a media column in an Exchange row is the 100 TB bug.
    val exch = plan.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exch.contains("media"), "media bytes cross an exchange:\n" + exch)
    assert("hashpartitioning\\(frame_hex".r.findAllIn(plan).nonEmpty, exch)
  }
}
