package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming-layer scale evidence (round 8): every `transformWithState`
  * processor is spec-pinned equal to its batch twin at fixture scale, but
  * pins say nothing about throughput or state growth. This harness runs
  * the continuous-ingestion paths over the sf1 corpus and reports msg/s,
  * per-micro-batch latency, and RocksDB state size from the query's own
  * `StreamingQueryProgress` — numbers for BENCHNOTES alongside
  * ThroughputBench's faithful-layer msg/s.
  *
  * Cases (all RocksDB-backed where stateful):
  *  1. BandIndexProcessor over sf1 documents' MinHash band rows (the
  *     streaming near-dup index), fed in waves of micro-batches.
  *  2. TransitionProcessor over sf1 events keyed by user_id (the
  *     sequence-aware Markov emitter; state = one value per key).
  *  3. The p1 file-stream pipeline (gate → dedup → chunk rollup) over the
  *     sf1 documents landing zone with maxFilesPerTrigger throttling.
  *
  * Not driver-run — `sbt "runMain graft.StreamBench [sfDir]"`. At sf10 the
  * MemoryStream feeds (10M collected event tuples, retained by the source
  * for the query's lifetime) exceed the default 8g heap — run with
  * `SPARK_DRIVER_MEM=24g` (r9: the transitions case OOMs at 8g, passes at
  * 24g with throughput in the r8 envelope).
  *
  * The corpus `.collect()`s below are the MemoryStream FEED (rows must
  * originate driver-side to be added in waves) — bench-harness plumbing,
  * not an operator path; the operators under test receive them through
  * the normal groupByKey shuffle. The p1 case uses a real file source
  * with no driver materialization at all.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("spark-warehouse/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def tmpDir(): String =
      java.nio.file.Files.createTempDirectory("streambench").toString

    /** Drain per-wave, then summarize the query's progress history. */
    def report(name: String, q: org.apache.spark.sql.streaming.StreamingQuery,
        totalRows: Long, wallSec: Double): Unit = {
      val progs = q.recentProgress.filter(_.numInputRows > 0)
      val batchMs = progs.map(_.durationMs.get("triggerExecution").toLong)
      val state = progs.lastOption.flatMap(_.stateOperators.headOption)
      val stateRows = state.map(_.numRowsTotal).getOrElse(0L)
      val stateBytes = state.map(_.memoryUsedBytes).getOrElse(0L)
      val sst = state.flatMap(s => Option(s.customMetrics.get("rocksdbSstFileSize")))
        .map(_.toString).getOrElse("0")
      println(f"[streambench] $name: $totalRows%d rows in $wallSec%.2f s = " +
        f"${totalRows / wallSec}%.0f rows/s; ${batchMs.length}%d batches, " +
        f"latency ms min/mean/max = ${if (batchMs.isEmpty) 0L else batchMs.min}%d/" +
        f"${if (batchMs.isEmpty) 0L else batchMs.sum / batchMs.length}%d/" +
        f"${if (batchMs.isEmpty) 0L else batchMs.max}%d; " +
        f"state rows = $stateRows%d, state mem = $stateBytes%d B, sst = $sst B")
    }

    // ---- 1. BandIndexProcessor over sf1 documents band rows --------------
    {
      val rows = graft.queries.Dedup.bandRows(spark, sfDir)
        .select(col("band"), col("band_sig"), col("doc_id"))
        .as[(Int, Long, Long)].collect()
      val waves = 10
      val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Int, Long, Long)]
      val cands = stream.toDS()
        .map(r => ((r._1, r._2), r._3))
        .groupByKey(_._1)
        .transformWithState(new graft.streaming.BandIndexProcessor(),
          org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
      val q = cands.toDF("doc_a", "doc_b").writeStream.outputMode(OutputMode.Append())
        .format("noop").option("checkpointLocation", tmpDir())
        .trigger(Trigger.ProcessingTime(0)).start()
      val t0 = System.nanoTime()
      (0 until waves).foreach { w =>
        stream.addData(rows.zipWithIndex.collect {
          case (r, i) if i % waves == w => r
        }.toSeq: _*)
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      report("band_index(sf docs)", q, rows.length.toLong, wall)
      q.stop()
    }

    // ---- 2. TransitionProcessor over sf1 events ---------------------------
    {
      val rows = Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_type"), col("event_id"))
        .as[(Long, String, Long)].collect()
      val waves = 10
      val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
      val out = stream.toDS()
        .groupByKey(_._1)
        .transformWithState(
          new graft.streaming.TransitionProcessor[Long](
            org.apache.spark.sql.Encoders.tuple(
              org.apache.spark.sql.Encoders.scalaLong,
              org.apache.spark.sql.Encoders.STRING)),
          org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
      val q = out.toDF("prev_type", "event_type").writeStream
        .outputMode(OutputMode.Update())
        .format("noop").option("checkpointLocation", tmpDir())
        .trigger(Trigger.ProcessingTime(0)).start()
      val t0 = System.nanoTime()
      (0 until waves).foreach { w =>
        stream.addData(rows.zipWithIndex.collect {
          case (r, i) if i % waves == w => r
        }.toSeq: _*)
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      report("transitions(sf events)", q, rows.length.toLong, wall)
      q.stop()
    }

    // ---- 2b. KmvDistinctProcessor over sf events (bounded-state distinct) --
    {
      val rows = Tables.events(spark, sfDir)
        .filter(col("user_id").isNotNull)
        .select(col("event_type"), xxhash64(col("user_id")).as("h"), col("event_id"))
        .as[(String, Long, Long)].collect()
      val waves = 10
      val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
      val out = stream.toDS()
        .groupByKey(_._1)
        .transformWithState(new graft.streaming.KmvDistinctProcessor[String](16384),
          org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
      val q = out.toDF("event_type", "ndv", "n_kept").writeStream
        .outputMode(OutputMode.Update())
        .format("noop").option("checkpointLocation", tmpDir())
        .trigger(Trigger.ProcessingTime(0)).start()
      val t0 = System.nanoTime()
      (0 until waves).foreach { w =>
        stream.addData(rows.zipWithIndex.collect {
          case ((t, h, _), i) if i % waves == w => (t, h)
        }.toSeq: _*)
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      report("kmv_distinct(sf events)", q, rows.length.toLong, wall)
      q.stop()
    }

    // ---- 2c. PctQuantileProcessor over sf events (bounded-state quantiles) --
    {
      val rows = Tables.events(spark, sfDir)
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("value").cast("double"))
        .as[(String, Double)].collect()
      val waves = 10
      val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Double)]
      val out = stream.toDS()
        .groupByKey(_._1)
        .transformWithState(
          new graft.streaming.PctQuantileProcessor[String](4096, Array(0.5, 0.99)),
          org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
      val q = out.toDF("event_type", "qs", "n").writeStream
        .outputMode(OutputMode.Update())
        .format("noop").option("checkpointLocation", tmpDir())
        .trigger(Trigger.ProcessingTime(0)).start()
      val t0 = System.nanoTime()
      (0 until waves).foreach { w =>
        stream.addData(rows.zipWithIndex.collect {
          case (r, i) if i % waves == w => r
        }.toSeq: _*)
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      report("pct_quantiles(sf events)", q, rows.length.toLong, wall)
      q.stop()
    }

    // ---- 2d. TopKProcessor over sf events (bounded-state heavy hitters) --
    {
      val rows = Tables.events(spark, sfDir)
        .filter(col("user_id").isNotNull)
        .select(col("event_type"), col("user_id"))
        .as[(String, Long)].collect()
      val waves = 10
      val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
      val out = stream.toDS()
        .groupByKey(_._1)
        .transformWithState(
          new graft.streaming.TopKProcessor[String](4096),
          org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
      val q = out.toDF("event_type", "hh", "n").writeStream
        .outputMode(OutputMode.Update())
        .format("noop").option("checkpointLocation", tmpDir())
        .trigger(Trigger.ProcessingTime(0)).start()
      val t0 = System.nanoTime()
      (0 until waves).foreach { w =>
        stream.addData(rows.zipWithIndex.collect {
          case (r, i) if i % waves == w => r
        }.toSeq: _*)
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      report("topk_heavy_hitters(sf events)", q, rows.length.toLong, wall)
      q.stop()
    }

    // ---- 2e. ProfileProcessor over sf lineitem (continuous column stats) --
    {
      val rows = Tables.lineitem(spark, sfDir)
        .select(col("l_returnflag"), col("l_partkey").cast("double").as("v"),
          when(col("l_partkey").isNotNull, xxhash64(col("l_partkey"))).as("h"))
        .as[(String, Option[Double], Option[Long])].collect()
      val waves = 10
      val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Option[Double], Option[Long])]
      val out = stream.toDS()
        .groupByKey(_._1)
        .transformWithState(
          new graft.streaming.ProfileProcessor[String](16384),
          org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
      val q = out.toDF("key", "n_rows", "n_null", "ndv", "mn", "mx").writeStream
        .outputMode(OutputMode.Update())
        .format("noop").option("checkpointLocation", tmpDir())
        .trigger(Trigger.ProcessingTime(0)).start()
      val t0 = System.nanoTime()
      (0 until waves).foreach { w =>
        stream.addData(rows.zipWithIndex.collect {
          case (r, i) if i % waves == w => r
        }.toSeq: _*)
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      report("profile(sf lineitem)", q, rows.length.toLong, wall)
      q.stop()
    }

    // ---- 2f. Scd2Processor over sf events (type-2 effectivity tracking) --
    {
      // sequence-aware: waves are CONTIGUOUS slices of the (ts, event_id)
      // order so per-key arrival stays batch-monotone (the Kafka shape the
      // processor is contracted for), unlike the i % waves interleave fine
      // for the order-free processors above
      val rows = Tables.events(spark, sfDir)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("tsu"), coalesce(col("event_id"), lit(0L)))
        .as[(Long, Option[String], Long, Long)].collect()
        .sortBy(r => (r._3, r._4))
      val waves = 10
      val per = math.max(1, (rows.length + waves - 1) / waves)
      val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Option[String], Long, Long)]
      val out = stream.toDS()
        .groupByKey(_._1)
        .transformWithState(new graft.streaming.Scd2Processor[Long](),
          org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
      val q = out.toDF("user_id", "ver", "attr", "valid_from", "valid_to", "n_events")
        .writeStream
        .outputMode(OutputMode.Update())
        .format("noop").option("checkpointLocation", tmpDir())
        .trigger(Trigger.ProcessingTime(0)).start()
      val t0 = System.nanoTime()
      rows.grouped(per).foreach { wave =>
        stream.addData(wave.toSeq: _*)
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      report("scd2(sf events)", q, rows.length.toLong, wall)
      q.stop()
    }

    // ---- 2g. RateLimitProcessor over sf events (sliding-window burst audit)
    {
      // same contiguous-wave shape as 2f: the processor's exact-parity
      // contract is per-key window-monotone arrival across batches
      val rows = Tables.events(spark, sfDir)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")))
        .as[(Long, Long)].collect()
        .sortBy(_._2)
      val waves = 10
      val per = math.max(1, (rows.length + waves - 1) / waves)
      val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      val out = stream.toDS()
        .groupByKey(_._1)
        .transformWithState(
          new graft.streaming.RateLimitProcessor[Long](21600L * 1000000L, 4),
          org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
      val q = out.toDF("user_id", "max_burst", "n_breach", "first_breach", "n_late")
        .writeStream
        .outputMode(OutputMode.Update())
        .format("noop").option("checkpointLocation", tmpDir())
        .trigger(Trigger.ProcessingTime(0)).start()
      val t0 = System.nanoTime()
      rows.grouped(per).foreach { wave =>
        stream.addData(wave.toSeq: _*)
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      report("ratelimit(sf events)", q, rows.length.toLong, wall)
      q.stop()
    }

    // ---- 2h. AsofJoinProcessor over sf events (temporal enrichment) -------
    {
      // same contiguous-wave shape as 2g: parity requires per-key
      // monotone arrival across batches; only the two participating
      // event types are fed (the processor's input contract). Waves are
      // cut on TIMESTAMP boundaries, not row positions — a positional
      // split could straddle a same-ts signup/purchase tie, which the
      // processor correctly flags late (it cannot reorder across the
      // batch seam) and the parity contract therefore excludes.
      val rows = Tables.events(spark, sfDir)
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          col("event_type").isin("signup", "purchase"))
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
          when(col("event_type") === "signup", 1).otherwise(0))
        .as[(Long, Long, Long, Int)].collect()
        .sortBy(_._3)
      val waves = 10
      val per = math.max(1, (rows.length + waves - 1) / waves)
      val waveSeqs = {
        val bufs = scala.collection.mutable.ArrayBuffer
          .empty[Seq[(Long, Long, Long, Int)]]
        var i = 0
        while (i < rows.length) {
          var j = math.min(i + per, rows.length)
          // extend past any run of equal timestamps at the cut point
          while (j < rows.length && rows(j)._3 == rows(j - 1)._3) j += 1
          bufs += rows.slice(i, j).toSeq
          i = j
        }
        bufs.toSeq
      }
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long, Int)]
      val out = stream.toDS()
        .groupByKey(_._1)
        .transformWithState(
          new graft.streaming.AsofJoinProcessor[Long](),
          org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
      val q = out.toDF("user_id", "event_id", "t", "signup_t", "late")
        .writeStream
        .outputMode(OutputMode.Update())
        .format("noop").option("checkpointLocation", tmpDir())
        .trigger(Trigger.ProcessingTime(0)).start()
      val t0 = System.nanoTime()
      waveSeqs.foreach { wave =>
        stream.addData(wave: _*)
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      report("asof(sf events)", q, rows.length.toLong, wall)
      q.stop()
    }

    // ---- 2i. IVM pipeline over sf events (changelog → maintained agg) ----
    {
      // batch e32 streamed: stage 1 derives ±(group, mu) retraction pairs
      // per entity (state = one contribution per key), stage 2 maintains
      // (n, n_vals, sum_mu) per GROUP (state = |groups| rows). Waves are
      // globally (ts, event_id)-sorted so every positional split is
      // per-key monotone — the parity contract.
      val rows = Tables.events(spark, sfDir)
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), col("event_id"),
          coalesce(unix_micros(col("ts")), lit(Long.MinValue)).as("t"),
          when(col("event_type") === "purchase", 0).otherwise(1),
          col("event_type"),
          when(!isnan(col("value")) && abs(col("value")) =!= lit(Double.PositiveInfinity),
            round(col("value") * 1e6).cast("bigint")))
        .as[(Long, Long, Long, Int, Option[String], Option[Long])].collect()
        .sortBy(r => (r._3, r._2))
      val waves = 10
      val per = math.max(1, (rows.length + waves - 1) / waves)
      val deltas = scala.collection.mutable.ArrayBuffer.empty[(Option[String], Option[Long], Long)]
      val s1 = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long, Int, Option[String], Option[Long])]
      val q1 = s1.toDS().groupByKey(_._1)
        .transformWithState(new graft.streaming.CdcRetractProcessor[Long](),
          org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
        .toDF("g", "mu", "sgn")
        .writeStream.outputMode(OutputMode.Update())
        .option("checkpointLocation", tmpDir())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          deltas ++= b.collect().map(r => (Option(r.getString(0)),
            if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2)))
          ()
        }
        .trigger(Trigger.ProcessingTime(0)).start()
      val t0 = System.nanoTime()
      rows.grouped(per).foreach { wave =>
        s1.addData(wave.toSeq: _*)
        q1.processAllAvailable()
      }
      val wall1 = (System.nanoTime() - t0) / 1e9
      report("ivm-changelog(sf events)", q1, rows.length.toLong, wall1)
      q1.stop()
      val s2 = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Option[String], Option[Long], Long)]
      val q2 = s2.toDS().groupByKey(_._1)
        .transformWithState(new graft.streaming.IvmAggProcessor[Option[String]](),
          org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
        .toDF("g", "n", "n_vals", "sum_mu")
        .writeStream.outputMode(OutputMode.Update())
        .format("noop").option("checkpointLocation", tmpDir())
        .trigger(Trigger.ProcessingTime(0)).start()
      val t1 = System.nanoTime()
      deltas.grouped(math.max(1, (deltas.length + waves - 1) / waves)).foreach { w =>
        s2.addData(w.toSeq: _*)
        q2.processAllAvailable()
      }
      val wall2 = (System.nanoTime() - t1) / 1e9
      report("ivm-agg(sf deltas)", q2, deltas.length.toLong, wall2)
      q2.stop()
    }

    // ---- 2j. SessionizeProcessor over sf events (gap sessions) -----------
    {
      // batch e3 streamed: five longs of state per user. Same contiguous
      // (ts, event_id)-sorted wave shape as 2f — per-key monotone arrival
      // is the parity contract (equal-ts seams are allowed).
      val rows = Tables.events(spark, sfDir)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
          coalesce(col("event_id"), lit(0L)))
        .as[(Long, Long, Long)].collect()
        .sortBy(r => (r._2, r._3))
      val waves = 10
      val per = math.max(1, (rows.length + waves - 1) / waves)
      val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
      val out = stream.toDS()
        .groupByKey(_._1)
        .transformWithState(new graft.streaming.SessionizeProcessor[Long](),
          org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
      val q = out.toDF("user_id", "session_id", "n_events", "start", "end", "n_late")
        .writeStream
        .outputMode(OutputMode.Update())
        .format("noop").option("checkpointLocation", tmpDir())
        .trigger(Trigger.ProcessingTime(0)).start()
      val t0 = System.nanoTime()
      rows.grouped(per).foreach { wave =>
        stream.addData(wave.toSeq: _*)
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      report("sessionize(sf events)", q, rows.length.toLong, wall)
      q.stop()
    }

    // ---- 3. p1 pipeline as a throttled file stream ------------------------
    {
      val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
      val landing = tmpDir()
      val srcDir = new java.io.File(s"$sfDir/documents.parquet")
      val parts = srcDir.listFiles().filter(_.getName.endsWith(".parquet"))
      parts.foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(s"$landing/${f.getName}"))
      }
      val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
      val nWords = size(split(trim(lower(col("text"))), "\\s+")).cast("bigint")
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4").parquet(landing)
        .filter(nWords.between(20, 80))
        .dropDuplicates("text")
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("wd"))
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, int((size(wd)-1)/24)), i -> size(slice(wd, i*24+1, 32)))"))
          .as(Seq("chunk_idx", "chunk_tokens")))
        .groupBy()
        .agg(sum(when(col("chunk_idx") === 0, 1L).otherwise(0L)).as("n_docs"),
          count(lit(1)).as("n_chunks"),
          sum(col("chunk_tokens").cast("bigint")).as("n_tokens"))
      val t0 = System.nanoTime()
      val q = stream.writeStream.outputMode(OutputMode.Complete())
        .format("memory").queryName("p1_stream_bench")
        .option("checkpointLocation", tmpDir()).start()
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      report("p1_file_stream(sf docs)", q, nDocs, wall)
      q.stop()
    }

    spark.stop()
  }
}
