package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for the driver's testdata (TESTDATA.md): builds
  * `sf1` (or any `factor`× target) from the read-only `sf0.1` source so the
  * 100×-lens plan claims can be MEASURED, not argued (BENCHNOTES scaling
  * curves). Usage:
  *
  *   runMain graft.GenData /root/testdata/sf0.1 spark-warehouse/sf1 10
  *
  * Methodology — each table scales the way the driver's own generator shape
  * would (seed-stable, no wall clock, no java.util.Random):
  *
  *  - region/nation: fixed dimensions, copied as-is (TPC-H convention).
  *  - customer/supplier/part/orders/lineitem/events: `factor` key-shifted
  *    copies via a broadcast cross join with the copy index — every key and
  *    foreign key shifts by `copy · stride` (stride = source key count), so
  *    per-copy join fan-out is IDENTICAL to the source and total work/key
  *    cardinality scale exactly ×factor. Value columns (prices, dates,
  *    quantities) replicate, which is how a larger draw from the same value
  *    distributions looks: domains get ×factor denser — exactly the property
  *    the q55 frame-vs-join experiment needs. Name columns are re-derived
  *    from the shifted key (`Customer#%09d`), and event times get +copy µs
  *    so row identity stays unique without moving any window boundary.
  *  - documents: generated FRESH with the measured recipe of the source
  *    corpus (31-word vocab with `dup` as the near-dup marker, uniform
  *    10–100 words per doc, lang ∈ en 40% / de es fr zh 15% each, source =
  *    src(id mod 20)), with planted near-duplicates (base text + " dup",
  *    4.8% of docs — source: 239/5000) and exact duplicates (0.16%) at the
  *    source's measured rates. Replicating texts instead would have created
  *    ×factor-size cross-copy near-dup cliques — a quadratic pair explosion
  *    the real generator does not have.
  *  - embeddings: fresh unit-norm 64-dim vectors (Box–Muller over xxhash64
  *    uniforms, then normalized — the source's isotropic no-cluster shape),
  *    labels uniform 0–9. Count scales ×4 per decade like the source
  *    (500 → 2000 from sf0.01 → sf0.1).
  *
  * All randomness is xxhash64(seed-tagged) — deterministic across runs and
  * partitionings. Output layout: 32 files for fact-sized tables so the
  * local[32] bench reads them fully parallel without Tables.parallelized.
  */
object GenData {
  private val VOCAB = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("spark-warehouse/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-gendata")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    gen(spark, src, out, factor)
    spark.stop()
  }

  def gen(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    // events.parquet carries TIMESTAMP(NANOS); read it as BIGINT nanos
    // everywhere in here (stride probe + replication) — Tables.events
    // makes the same choice.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String, files: Int): Unit = {
      df.repartition(files).write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[gendata] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }

    // Broadcast copy index: one source scan feeds all `factor` copies.
    val copies = broadcast(spark.range(factor).withColumnRenamed("id", "cp"))
    // Per-ENTITY key strides (max key + 1), computed from the source so
    // generations chain (sf0.1 → sf1 → sf10): a key and every foreign key
    // referencing it must shift by the same stride or FK closure breaks.
    def stride(t: String, k: String): Long =
      read(t).agg(max(col(k))).head.getLong(0) + 1
    val custS = stride("customer", "c_custkey")
    val suppS = stride("supplier", "s_suppkey")
    val partS = stride("part", "p_partkey")
    val ordS = stride("orders", "o_orderkey")
    val evS = stride("events", "event_id")
    val userS = stride("events", "user_id")
    def replicate(t: String, shifts: Map[String, Long], extra: DataFrame => DataFrame = identity) = {
      val base = read(t)
      val shifted = shifts.foldLeft(base.crossJoin(copies)) { case (df, (k, st)) =>
        df.withColumn(k, col(k) + col("cp") * st)
      }
      extra(shifted).select(base.columns.map(col).toIndexedSeq: _*)
    }

    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)
    write(replicate("customer", Map("c_custkey" -> custS),
      _.withColumn("c_name", format_string("Customer#%09d", col("c_custkey")))), "customer", 4)
    write(replicate("supplier", Map("s_suppkey" -> suppS),
      _.withColumn("s_name", format_string("Supplier#%09d", col("s_suppkey")))), "supplier", 1)
    write(replicate("part", Map("p_partkey" -> partS)), "part", 4)
    write(replicate("orders", Map("o_orderkey" -> ordS, "o_custkey" -> custS)), "orders", 32)
    write(replicate("lineitem",
      Map("l_orderkey" -> ordS, "l_partkey" -> partS, "l_suppkey" -> suppS)), "lineitem", 32)
    // events.ts: +copy µs keeps event identity unique without moving any
    // window boundary. The source has shipped ts both as BIGINT nanos
    // (nanosAsLong layout set above) and as plain TIMESTAMP(MICROS) —
    // shift in the scanned type's own unit.
    write(replicate("events", Map("event_id" -> evS, "user_id" -> userS),
      df => df.withColumn("ts", df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => col("ts") + col("cp") * 1000L
        case _ => expr("timestampadd(MICROSECOND, cp, ts)")
      })), "events", 32)

    // --- documents: fresh corpus at the measured recipe -------------------
    val srcDocs = read("documents").count()
    val nDocs = srcDocs * factor
    val nNear = (nDocs * 239L) / 5000L   // measured: 239 planted near-dup pairs / 5000 docs
    val nExact = (nDocs * 8L) / 5000L    // measured: 8 exact-dup pairs / 5000 docs
    val nBase = nDocs - nNear - nExact
    val vocabArr = array(VOCAB.map(lit): _*)
    val base = spark.range(nBase).withColumnRenamed("id", "doc_id")
      .withColumn("wc", (lit(10) + pmod(xxhash64(lit("wc"), col("doc_id")), lit(91))).cast("int"))
      .withColumn("text", array_join(
        transform(sequence(lit(0), col("wc") - 1),
          i => element_at(vocabArr, (pmod(xxhash64(col("doc_id"), i), lit(VOCAB.size)) + 1).cast("int"))),
        " "))
      .drop("wc")
    val baseCk = base.localCheckpoint(true)
    def plantFrom(n: Long, tag: String, startId: Long, suffix: String) =
      spark.range(n).select(
        (col("id") + startId).as("doc_id"),
        pmod(xxhash64(lit(tag), col("id")), lit(nBase)).as("base_id"))
        .join(baseCk.select(col("doc_id").as("base_id"), col("text").as("base_text")), "base_id")
        .select(col("doc_id"), concat(col("base_text"), lit(suffix)).as("text"))
    val near = plantFrom(nNear, "nd", nBase, " dup")
    val exact = plantFrom(nExact, "xd", nBase + nNear, "")
    val docs = baseCk.select("doc_id", "text").union(near).union(exact)
      .withColumn("lang", expr(
        "CASE WHEN pmod(xxhash64('lang', doc_id), 100) < 40 THEN 'en' " +
          "WHEN pmod(xxhash64('lang', doc_id), 100) < 55 THEN 'de' " +
          "WHEN pmod(xxhash64('lang', doc_id), 100) < 70 THEN 'es' " +
          "WHEN pmod(xxhash64('lang', doc_id), 100) < 85 THEN 'fr' ELSE 'zh' END"))
      .withColumn("source", concat(lit("src"), pmod(col("doc_id"), lit(20))))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
    write(docs, "documents", 32)

    // --- embeddings: fresh isotropic unit vectors -------------------------
    // Source scales ×4 per decade (500 → 2000); Box–Muller over two
    // xxhash64 uniforms gives the same gaussian-then-normalize shape.
    // The ×4-per-decade law generalizes to any factor as 4^log10(factor)
    // (r8 ADVICE fix: a hard ×4 only matched factor=10 — a factor-2 run
    // silently produced a ×4 corpus and chained non-decade generations
    // drifted from the documented curve).
    val nVecs = math.round(
      read("embeddings").count() * math.pow(4.0, math.log10(factor.toDouble)))
    val gauss = (tag: String) => expr(
      s"""transform(sequence(0, 63), i ->
         |  sqrt(-2.0 * ln((pmod(xxhash64('u1$tag', vec_id, i), 1000000000) + 0.5) / 1000000000.0))
         |  * cos(2.0 * pi() * (pmod(xxhash64('u2$tag', vec_id, i), 1000000000) + 0.5) / 1000000000.0))
         |""".stripMargin)
    val vecs = spark.range(nVecs).withColumnRenamed("id", "vec_id")
      .withColumn("raw", gauss(""))
      .withColumn("nrm", expr("sqrt(aggregate(raw, 0D, (acc, x) -> acc + x * x))"))
      .withColumn("embedding", expr("transform(raw, x -> cast(x / nrm AS FLOAT))"))
      .withColumn("label", pmod(xxhash64(lit("lb"), col("vec_id")), lit(10)).cast("int"))
      .select("vec_id", "embedding", "label")
    write(vecs, "embeddings", 8)
  }
}
