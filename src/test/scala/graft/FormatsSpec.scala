package graft

import org.apache.spark.sql.functions._

/** Batch source formats beyond parquet (SURVEY.md §2.4 Scans row): CSV and
  * JSON round-trips of the events table, plus the HLL++ error bound. */
class FormatsSpec extends SparkTestBase {

  test("csv scan round-trip preserves rows and values") {
    val events = Tables.events(spark, sf).select("event_id", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    events.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(events.schema).csv(dir)
    assert(back.count() == events.count())
    val a = events.agg(sum("value")).collect()(0).getDouble(0)
    val b = back.agg(sum("value")).collect()(0).getDouble(0)
    assert(math.abs(a - b) < 1e-6)
  }

  test("json scan round-trip with NaN handling") {
    val events = Tables.events(spark, sf).select("event_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    events.write.mode("overwrite").json(dir)
    val back = spark.read.schema(events.schema).json(dir)
    assert(back.count() == events.count())
  }

  test("orc scan round-trip preserves rows and values exactly") {
    val src = Tables.supplier(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("avro file round-trip preserves rows and values exactly (jar-gated; canceled offline)") {
    // The spark-avro CONNECTOR doesn't ship in /opt/spark/jars (only the
    // core avro library, which Decoders uses for payload decode) — same
    // deploy-classpath situation as the Kafka source, gated the same way.
    assume(
      try {
        org.apache.spark.sql.execution.datasources.DataSource
          .lookupDataSource("avro", spark.sessionState.conf)
        true
      } catch { case _: Throwable => false },
      "spark-avro connector jar not on the classpath (offline image)")
    val src = Tables.events(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-avro").toString
    src.write.mode("overwrite").format("avro").save(dir)
    val back = spark.read.format("avro").load(dir)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("partitioned parquet layout: partition pruning reaches the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.documents(spark, sf).write.mode("overwrite")
      .partitionBy("lang").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the lang predicate must be a PartitionFilter (directory pruning),
    // not a data filter evaluated per row
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan.take(3000))
    val en = Tables.documents(spark, sf).filter(col("lang") === "en").count()
    assert(pruned.count() == en)
  }

  test("bucketed tables: co-located join plans without a shuffle") {
    // The in-memory catalog forgets tables between sessions but leaves the
    // managed locations on disk — clear both before creating.
    def cleanup(): Unit = Seq("b_docs", "b_embs").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, t)
      if (loc.exists) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    cleanup()
    Tables.documents(spark, sf).select("doc_id", "lang")
      .write.bucketBy(4, "doc_id").sortBy("doc_id").saveAsTable("b_docs")
    Tables.embeddings(spark, sf).select(col("vec_id").as("doc_id"), col("label"))
      .write.bucketBy(4, "doc_id").sortBy("doc_id").saveAsTable("b_embs")
    // disable autobroadcast so the join exercises the bucketed layout
    // (broadcast would bypass bucketing on these tiny tables)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_docs").join(spark.table("b_embs"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      // both sides pre-bucketed on the join key ⇒ sort-merge with NO
      // shuffle exchange — the co-located-join layout for repeated joins
      assert(plan.contains("SortMergeJoin"), plan.take(3000))
      assert(!plan.contains("Exchange"), plan.take(3000))
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      cleanup()
    }
  }

  test("z-order layout: file stat envelopes prune on BOTH dimensions") {
    import scala.jdk.CollectionConverters._
    // 64 files over a 512x512 (x, y) grid where y is a hash scramble of x
    // (independent dims). A single-dim sort gives each file the FULL y
    // domain (no pruning on y); the z-order write must give every file a
    // narrow envelope on x AND y — the multi-dim data-skipping contract.
    val n = 262144L
    val base = spark.range(n).select(
      (col("id") % 512).as("x"),
      (col("id") * 2654435761L % 512).as("y"))
    val dirX = java.nio.file.Files.createTempDirectory("graft-xsort").toString
    val dirZ = java.nio.file.Files.createTempDirectory("graft-zord").toString
    base.repartitionByRange(64, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(dirX)
    graft.operators.ZOrder.writeZOrdered(base, dirZ, Seq("x", "y"), 64)

    // round-trip: the layout must not change the data
    val back = spark.read.parquet(dirZ)
    assert(back.count() == n)
    assert(back.agg(sum(col("x")), sum(col("y"))).collect()(0) ==
      base.agg(sum(col("x")), sum(col("y"))).collect()(0))

    /** Per parquet file: (min, max) of `column` from the footer blocks —
      * the stats a reader consults before touching any page. */
    def envelopes(dir: String, column: String): Seq[(Long, Long)] = {
      val conf = new org.apache.hadoop.conf.Configuration()
      new java.io.File(dir).listFiles.filter(_.getName.endsWith(".parquet")).toSeq
        .map { f =>
          val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(f.getPath), conf))
          try {
            val stats = rdr.getFooter.getBlocks.asScala
              .map(_.getColumns.asScala.find(_.getPath.toDotString == column).get.getStatistics)
            (stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min,
              stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max)
          } finally rdr.close()
        }
    }
    def hitFrac(env: Seq[(Long, Long)], lo: Long, hi: Long): Double =
      env.count { case (mn, mx) => mx >= lo && mn <= hi }.toDouble / env.length

    // x-sorted layout: prunes x, but every file spans the whole y domain
    assert(hitFrac(envelopes(dirX, "x"), 100, 110) <= 0.35)
    assert(hitFrac(envelopes(dirX, "y"), 100, 110) >= 0.9,
      "control: single-dim sort must NOT prune the other dim")
    // z-order layout: a ~2% slab on EITHER dim touches only the grid row/
    // column of files that actually contain it (8x8 z-grid at 64 files)
    val zx = hitFrac(envelopes(dirZ, "x"), 100, 110)
    val zy = hitFrac(envelopes(dirZ, "y"), 100, 110)
    assert(zx <= 0.35, s"z layout must prune on x, hit fraction $zx")
    assert(zy <= 0.35, s"z layout must prune on y, hit fraction $zy")
  }

  test("z-order: non-finite and null values do not collapse a dimension's codes") {
    // One NaN in a dim would make max() NaN and zero the scale, silently
    // flattening EVERY row's code on that dim. The stats must ignore
    // non-finite values: clean rows keep identical z-values with or
    // without dirty rows present, and the dirty rows land on valid
    // (non-negative, in-range) codes instead of corrupting the interleave.
    val spark0 = spark
    import spark0.implicits._
    val clean = spark.range(4096).select(col("id"),
      (col("id") % 64).cast("double").as("x"),
      (col("id") * 2654435761L % 64).cast("double").as("y"))
    val dirty = Seq[(Long, java.lang.Double, java.lang.Double)](
      (100000L, Double.NaN, 1.0),
      (100001L, Double.PositiveInfinity, 2.0),
      (100002L, 3.0, Double.NegativeInfinity),
      (100003L, null, 5.0)).toDF("id", "x", "y")
    val a = graft.operators.ZOrder.withZValue(clean, Seq("x", "y"), 8)
      .select(col("id"), col("__z").as("za"))
    val b = graft.operators.ZOrder.withZValue(clean.unionByName(dirty), Seq("x", "y"), 8)
      .select(col("id"), col("__z").as("zb"))
    assert(a.join(b, "id").filter(col("za") =!= col("zb")).count() == 0,
      "dirty rows must not change clean rows' z-values")
    val maxZ = (1L << 16) - 1 // 2 dims x 8 bits
    b.filter(col("id") >= 100000L).collect().foreach { r =>
      val z = r.getLong(1)
      assert(z >= 0 && z <= maxZ, s"dirty row ${r.getLong(0)} got invalid z $z")
    }
  }

  test("z-order interleave: 3-dim bit-gather path is a valid Morton code") {
    // The generic path must agree with a reference bit calculation.
    val df = spark.range(64).select(
      (col("id") % 4).as("a"), expr("id div 4 % 4").as("b"), expr("id div 16 % 4").as("c"))
    val z = df.select(col("a"), col("b"), col("c"),
      graft.operators.ZOrder.interleave(Seq(col("a"), col("b"), col("c")), 2).as("z"))
      .collect()
    z.foreach { r =>
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val expect = (0 until 2).map { bit =>
        (((a >> bit) & 1L) << (bit * 3)) |
          (((b >> bit) & 1L) << (bit * 3 + 1)) |
          (((c >> bit) & 1L) << (bit * 3 + 2))
      }.reduce(_ | _)
      assert(r.getLong(3) == expect, s"($a,$b,$c): ${r.getLong(3)} != $expect")
    }
  }

  test("approx_count_distinct stays within HLL++ error bound") {
    // q6 is sketch-only (r8 — the embedded exact comparison column was the
    // 12.8×/decade cost at sf10); the exact side lives HERE, at spec scale.
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val r = graft.queries.Relational.queries("q6_approx_distinct")(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val approx = row.getLong(1).toDouble
      val e = exact(row.getString(0))
      assert(math.abs(approx - e) / e < 0.1,
        s"approx $approx vs exact $e off by >10%")
    }
  }

  test("approx_percentile stays within a rank-derived bound of q7's exact values") {
    // accuracy=1000 ⇒ rank error ≤ 1/1000 of each group; the bound below is
    // 2% of the observed value RANGE — ~20× the sketch's guarantee on this
    // data, yet tight enough that a broken sketch (e.g. constant 0) fails.
    val range = Tables.lineitem(spark, sf)
      .agg(max(col("l_partkey")).cast("double") - min(col("l_partkey")).cast("double"))
      .head().getDouble(0)
    val exact = graft.queries.Relational.queries("q7_percentiles")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val r = graft.queries.Relational.queries("q45_approx_percentiles")(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (p50e, p90e) = exact(row.getString(0))
      Seq((1, p50e), (2, p90e)).foreach { case (ai, e) =>
        val approx = row.getLong(ai).toDouble
        assert(math.abs(approx - e) <= 0.02 * range,
          s"approx_percentile $approx vs exact $e beyond 2% of range $range")
      }
    }
  }
}
