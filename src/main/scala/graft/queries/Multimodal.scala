package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column operators: image/audio/video ride through the engine as
  * opaque `binary` columns with typed metadata (exactly how the reference
  * carries base64 JPEG data-URIs through HSTORE —
  * `/root/reference/tests/test_dbsink.py:1034-1048`).
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * libraries ship in this container); the Spark-side plumbing is real and
  * what the tests/oracle verify: binary column construction, struct
  * metadata, per-partition batched decode via `mapPartitions` (the Scala
  * analogue of a Pandas-UDF batch), and frame sampling with binary slicing.
  * At scale each operator is a narrow map over the corpus — no shuffle.
  */
object Multimodal {

  /** STUB decode: deterministic pseudo-features from raw bytes. A real
    * deployment swaps this body for an image decoder; the signature
    * (bytes → fixed-width features) and the batch shape are the contract. */
  def stubDecode(bytes: Array[Byte]): (Int, Long, Double) = {
    val n = bytes.length
    var checksum = 0L
    var i = 0
    while (i < n) { checksum = (checksum * 31 + (bytes(i) & 0xff)) & 0x7fffffffL; i += 1 }
    val meanByte = if (n == 0) 0.0 else {
      var s = 0L; var j = 0
      while (j < n) { s += (bytes(j) & 0xff); j += 1 }
      s.toDouble / n
    }
    (n, checksum, meanByte)
  }

  /** The multimodal table: binary payload + typed metadata struct. */
  private def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      struct(
        lit("jpeg").as("format"),
        (lit(64) + col("doc_id") % 512).cast("int").as("width"),
        (lit(64) + col("doc_id") % 256).cast("int").as("height")).as("meta"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary column + metadata struct construction.
    // The binary payload and metadata struct ride through the plan typed;
    // they are rendered to hex/JSON text only at the driver boundary
    // (binary and struct values aren't hashable there).
    "mm1_media_table" -> { (s, d) =>
      mediaTable(s, d)
        .select(col("doc_id"), hex(col("media")).as("media_hex"),
          to_json(col("meta")).as("meta"),
          length(col("media")).cast("int").as("n_bytes"),
          md5(col("media")).as("digest"))
        .orderBy(col("doc_id"))
    },
    // Batched decode via mapPartitions (Pandas-UDF-shaped: one iterator of
    // rows per partition, features out).
    "mm2_decode_features" -> { (s, d) =>
      val df = mediaTable(s, d)
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("n_bytes", IntegerType),
        StructField("checksum", LongType), StructField("mean_byte", DoubleType)))
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
      df.select("doc_id", "media").mapPartitions { rows =>
        rows.map { r =>
          val (n, ck, mb) = stubDecode(r.getAs[Array[Byte]]("media"))
          Row(r.getLong(0), n, ck, mb)
        }
      }(enc).orderBy(col("doc_id"))
    },
    // Resize: aspect-preserving fit into a 128×128 box — the geometry is
    // exact integer arithmetic over the metadata struct (floor division,
    // engine-identical), and the pixel resample is the same honest stub
    // shape as mm2: a deterministic byte-slice standing in for the decoder
    // (the slice length tracks the computed output geometry, so the
    // contract — smaller box ⇒ smaller payload — is real). Narrow map,
    // no shuffle.
    "mm4_resize" -> { (s, d) =>
      mediaTable(s, d)
        .select(col("doc_id"), col("media"),
          col("meta.width").as("w"), col("meta.height").as("h"))
        .withColumn("out_w", expr("CAST(w * 128 div greatest(w, h) AS INT)"))
        .withColumn("out_h", expr("CAST(h * 128 div greatest(w, h) AS INT)"))
        .withColumn("thumb_bytes",
          least(length(col("media")), expr("out_w * out_h div 64")).cast("int"))
        .withColumn("thumb_digest",
          md5(expr("substring(media, 1, thumb_bytes)")))
        .select(col("doc_id"), col("w"), col("h"), col("out_w"), col("out_h"),
          col("thumb_bytes"), col("thumb_digest"))
        .orderBy(col("doc_id"))
    },
    // Frame sampling: fixed-size binary windows every `stride` bytes
    // (video-frame analogue), via binary slicing — no UDF.
    "mm3_frame_sample" -> { (s, d) =>
      mediaTable(s, d)
        .select(col("doc_id"), col("media"), length(col("media")).as("len"))
        .select(col("doc_id"),
          posexplode(expr(
            "transform(sequence(0, int((len - 1) / 64)), i -> substring(media, i * 64 + 1, 32))"))
            .as(Seq("frame_idx", "frame")))
        .withColumn("frame_digest", md5(col("frame")))
        .select(col("doc_id"), col("frame_idx"), col("frame_digest"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    // Content-addressed blob dedup — the media pass that runs BEFORE any
    // decode: group by payload digest so each distinct blob is decoded/
    // stored once (the canonical object-store layout), keep the lowest
    // doc_id as the canonical reference and report the bytes saved. The
    // shuffle carries (digest, 2×int) — 16-byte keys, never media bytes.
    "mm5_blob_dedup" -> { (s, d) =>
      mediaTable(s, d)
        .select(col("doc_id"), md5(col("media")).as("digest"),
          length(col("media")).cast("bigint").as("n_bytes"))
        .groupBy(col("digest"))
        .agg(min(col("doc_id")).as("canonical_id"),
          count(lit(1)).as("n_refs"),
          max(col("n_bytes")).as("blob_bytes"),
          (sum(col("n_bytes")) - max(col("n_bytes"))).as("bytes_saved"))
        .orderBy(col("digest"))
    },
    // Storage-layout profile: blob-size distribution per source — the
    // numbers that size `maxPartitionBytes` / target file sizes before a
    // 100 TB media write (mean alone misleads when a few huge blobs skew a
    // source). Exact BIGINT byte sums; quartiles interpolate INTEGER byte
    // lengths at g ∈ {0,¼,½,¾} — IEEE-exact on both engines (q53's
    // recipe). One aggregation shuffle on source; bytes never move, only
    // their lengths.
    "mm6_storage_profile" -> { (s, d) =>
      mediaTable(s, d)
        .join(Tables.documents(s, d).select(col("doc_id"), col("source")), "doc_id")
        .select(col("source"), length(col("media")).cast("bigint").as("n_bytes"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).as("total_bytes"),
          expr("percentile(n_bytes, 0.25)").as("p25_bytes"),
          expr("percentile(n_bytes, 0.5)").as("p50_bytes"),
          expr("percentile(n_bytes, 0.75)").as("p75_bytes"),
          max(col("n_bytes")).as("max_bytes"))
        .orderBy(col("source"))
    }
  )

  def oracle: Map[String, String] = Map(
    "mm1_media_table" ->
      """SELECT doc_id, hex(encode(text)) AS media_hex,
        |  to_json({'format': 'jpeg',
        |           'width': CAST(64 + doc_id % 512 AS INT),
        |           'height': CAST(64 + doc_id % 256 AS INT)}) AS meta,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,
    // The stub's features are exact integer arithmetic over the bytes, so a
    // full oracle exists (ASCII corpus ⇒ ascii(char) == byte value): the
    // checksum folds (acc*31 + b) & 0x7fffffff and stays < 2^36 — no
    // overflow; the empty-input reduce over the prepended seed yields 0,
    // matching stubDecode's n=0 contract.
    "mm2_decode_features" ->
      """WITH t AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents)
        |SELECT doc_id, CAST(n AS INT) AS n_bytes,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(n), i -> CAST(ascii(text[i+1]) AS BIGINT))),
        |    (a,b) -> (a*31+b) & 2147483647) AS checksum,
        |  CASE WHEN n = 0 THEN CAST(0 AS DOUBLE) ELSE
        |    CAST(list_sum(list_transform(range(n),
        |      i -> CAST(ascii(text[i+1]) AS BIGINT))) AS DOUBLE) / n END AS mean_byte
        |FROM t ORDER BY doc_id""".stripMargin,
    // Geometry is integer floor division on both engines; ASCII corpus ⇒
    // byte slice mirrored with VARCHAR substring (as mm3).
    "mm4_resize" ->
      """WITH m AS (
        |  SELECT doc_id, text,
        |    CAST(64 + doc_id % 512 AS INT) AS w,
        |    CAST(64 + doc_id % 256 AS INT) AS h,
        |    octet_length(encode(text)) AS len
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, text, w, h, len,
        |    CAST(w * 128 // greatest(w, h) AS INT) AS out_w,
        |    CAST(h * 128 // greatest(w, h) AS INT) AS out_h
        |  FROM m)
        |SELECT doc_id, w, h, out_w, out_h,
        |  CAST(least(len, out_w * out_h // 64) AS INT) AS thumb_bytes,
        |  md5(text[1:CAST(least(len, out_w * out_h // 64) AS INT)]) AS thumb_digest
        |FROM g ORDER BY doc_id""".stripMargin,
    // ASCII corpus ⇒ byte and character offsets agree, so the blob slicing
    // is mirrored with VARCHAR substring (DuckDB 1.0 has no md5(BLOB)).
    // range() takes constants only: 16 frames covers max len 577 ≪ 16·64.
    "mm3_frame_sample" ->
      """WITH m AS (SELECT doc_id, text,
        |                  octet_length(encode(text)) AS len FROM documents),
        |f AS (SELECT doc_id, i AS frame_idx,
        |             md5(substring(text, CAST(i * 64 + 1 AS INT), 32)) AS frame_digest
        |      FROM m CROSS JOIN range(0, 16) t(i)
        |      WHERE i <= (len - 1) // 64)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx, frame_digest
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "mm5_blob_dedup" ->
      """SELECT md5(text) AS digest, min(doc_id) AS canonical_id,
        |  count(*) AS n_refs,
        |  CAST(max(octet_length(encode(text))) AS BIGINT) AS blob_bytes,
        |  CAST(sum(octet_length(encode(text))) - max(octet_length(encode(text))) AS BIGINT) AS bytes_saved
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "mm6_storage_profile" ->
      """WITH b AS (
        |  SELECT source, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents)
        |SELECT source, count(*) AS n,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  quantile_cont(n_bytes, 0.25) AS p25_bytes,
        |  quantile_cont(n_bytes, 0.5) AS p50_bytes,
        |  quantile_cont(n_bytes, 0.75) AS p75_bytes,
        |  max(n_bytes) AS max_bytes
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
