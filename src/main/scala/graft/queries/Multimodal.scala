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
  * The decode step is REAL: `javax.imageio.ImageIO` (see
  * [[graft.functions.Images]]) decodes actual PNG payloads inside batched
  * `mapPartitions` (the Scala analogue of a Pandas-UDF batch), and
  * MultimodalSpec pins the same decoder against the reference's base64 JPEG
  * fixtures. mm2/mm4 run over a deterministic pattern-PNG corpus keyed by
  * doc_id so their pixel features are exact integers the DuckDB oracle
  * recomputes arithmetically (PNG is lossless — decoded pixels equal the
  * generated pattern bit-for-bit). At scale each operator is a narrow map
  * over the corpus — no shuffle, image bytes never leave their partition.
  */
object Multimodal {

  /** The multimodal table: binary payload + typed metadata struct. */
  private def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.validDocuments(s, d).select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      struct(
        lit("jpeg").as("format"),
        (lit(64) + col("doc_id") % 512).cast("int").as("width"),
        (lit(64) + col("doc_id") % 256).cast("int").as("height")).as("meta"))

  /** Real-image corpus for the decode operators: one genuine PNG per
    * document, encoded from the doc_id-keyed gray pattern (Images.
    * encodePatternPng). Generated per-partition — the encode is itself the
    * write half of the codec round trip mm2/mm4 verify. Kept separate from
    * mediaTable so mm1/mm3/mm5/mm6's byte-level oracles (which mirror the
    * payload in SQL) keep their text-derived payloads. */
  private def pngTable(s: SparkSession, d: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("png", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    Tables.parallelized(Tables.validDocuments(s, d)).select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, graft.functions.Images.encodePatternPng(id))
        }
      }(enc)
  }

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
    // Batched REAL decode via mapPartitions (Pandas-UDF-shaped: one iterator
    // of rows per partition, features out). The payload is a real PNG
    // (pattern keyed by doc_id, encoded with ImageIO — see pngTable) and the
    // decode is ImageIO.read; features are the decoded geometry plus the
    // exact RGB pixel sum, which the oracle recomputes from the pattern
    // arithmetic because PNG round-trips pixels losslessly. A payload that
    // fails to decode is a hard error HERE because this corpus is 100%
    // synthetic images; a production media scan would route Nones to a
    // dead-letter count instead (S3's PERMISSIVE-decode convention).
    "mm2_decode_features" -> { (s, d) =>
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("width", IntegerType),
        StructField("height", IntegerType), StructField("n_px", IntegerType),
        StructField("pix_sum", LongType)))
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
      pngTable(s, d).mapPartitions { rows =>
        rows.map { r =>
          val img = graft.functions.Images.decode(r.getAs[Array[Byte]](1))
            .getOrElse(throw new IllegalStateException(
              s"mm2_decode_features: undecodable image payload for doc_id=${r.getLong(0)}"))
          val (sum, n) = graft.functions.Images.rgbSum(img)
          Row(r.getLong(0), img.getWidth, img.getHeight, n, sum)
        }
      }(enc).orderBy(col("doc_id"))
    },
    // Resize: REAL aspect-preserving box-fit rescale on the decoded
    // BufferedImage (ImageIO decode → nearest-neighbor resample → pixel-sum
    // features). Nearest-neighbor with floor-division source mapping keeps
    // the resample integer-exact, so the oracle mirrors the full decode →
    // rescale → feature pipeline arithmetically. Narrow map, no shuffle.
    "mm4_resize" -> { (s, d) =>
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("w", IntegerType),
        StructField("h", IntegerType), StructField("out_w", IntegerType),
        StructField("out_h", IntegerType), StructField("n_thumb_px", IntegerType),
        StructField("thumb_pix_sum", LongType)))
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
      pngTable(s, d).mapPartitions { rows =>
        rows.map { r =>
          val img = graft.functions.Images.decode(r.getAs[Array[Byte]](1))
            .getOrElse(throw new IllegalStateException(
              s"mm4_resize: undecodable image payload for doc_id=${r.getLong(0)}"))
          val thumb = graft.functions.Images.resizeBoxFit(img, 16)
          val (sum, n) = graft.functions.Images.rgbSum(thumb)
          Row(r.getLong(0), img.getWidth, img.getHeight,
            thumb.getWidth, thumb.getHeight, n, sum)
        }
      }(enc).orderBy(col("doc_id"))
    },
    // Frame sampling: fixed-size binary windows every `stride` bytes
    // (video-frame analogue), via binary slicing — no UDF.
    // r13 adjudication of the hostile-corpus divergence (3471 vs 2627
    // rows): the old oracle capped frames at range(0, 16) — a silent
    // assumption that no blob exceeds 1024 bytes, which a 55 kB payload
    // breaks — and md5'd CHARACTER substrings where the engine windows
    // BYTES (divergent on any multibyte payload). The contract is pinned
    // to the engine's byte semantics: frames are fixed BYTE windows over
    // the blob, uncapped, and the fingerprint is the frame's hex (64 hex
    // chars = 32 bytes), which both engines can compute byte-exactly
    // (this DuckDB build has no md5(BLOB)). A zero-length blob emits one
    // empty frame (sequence(0, int((0-1)/64)) = [0] — int() truncates
    // toward zero; the oracle mirrors with greatest(..., 0) since
    // DuckDB's // floors).
    "mm3_frame_sample" -> { (s, d) =>
      mediaTable(s, d)
        .select(col("doc_id"), col("media"), length(col("media")).as("len"))
        .select(col("doc_id"),
          posexplode(expr(
            "transform(sequence(0, int((len - 1) / 64)), i -> substring(media, i * 64 + 1, 32))"))
            .as(Seq("frame_idx", "frame")))
        .withColumn("frame_hex", hex(col("frame")))
        .select(col("doc_id"), col("frame_idx"), col("frame_hex"))
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
        .join(Tables.validDocuments(s, d).select(col("doc_id"), col("source")), "doc_id")
        .select(col("source"), length(col("media")).cast("bigint").as("n_bytes"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).as("total_bytes"),
          expr("percentile(n_bytes, 0.25)").as("p25_bytes"),
          expr("percentile(n_bytes, 0.5)").as("p50_bytes"),
          expr("percentile(n_bytes, 0.75)").as("p75_bytes"),
          max(col("n_bytes")).as("max_bytes"))
        .orderBy(col("source"))
    },
    // Multipart-transfer manifest: split each blob into fixed 2 KiB chunks
    // and emit per-chunk (offset, size, md5) plus the doc's chunk count —
    // the planning table for chunked upload/download of a 100 TB media
    // store (each chunk independently transferable and verifiable; the
    // ragged last chunk carries its true size). Chunk extraction runs over
    // the hex dump so the oracle is byte-exact (mm3/t5's r8 lesson: DuckDB
    // in this build has no BLOB substring/md5, and hex names each byte
    // identically on both engines); the production form substrings the
    // binary column directly — same plan shape, half the bytes in flight.
    // Zero-byte blobs produce no chunks, so no manifest rows (empty
    // generate_series on both engines). Scale shape: a narrow map +
    // generate per row — no shuffle at all; the manifest shuffles only if
    // the caller re-sorts it.
    "mm7_chunk_manifest" -> { (s, d) =>
      val CHUNK = 2048 // bytes; 2·CHUNK hex chars
      mediaTable(s, d)
        .select(col("doc_id"), hex(col("media")).as("h"),
          length(col("media")).cast("bigint").as("n_bytes"))
        .filter(col("n_bytes") > 0L)
        .withColumn("n_chunks",
          expr(s"CAST((n_bytes + ${CHUNK - 1}) DIV $CHUNK AS INT)"))
        .select(col("doc_id"), col("h"), col("n_chunks"),
          explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_idx"))
        .withColumn("offset_bytes", col("chunk_idx").cast("bigint") * CHUNK)
        .withColumn("chunk_hex",
          expr(s"substring(h, chunk_idx * ${2 * CHUNK} + 1, ${2 * CHUNK})"))
        .withColumn("chunk_bytes", expr("CAST(length(chunk_hex) DIV 2 AS BIGINT)"))
        .withColumn("chunk_md5", md5(col("chunk_hex").cast("binary")))
        .select(col("doc_id"), col("chunk_idx"), col("n_chunks"),
          col("offset_bytes"), col("chunk_bytes"), col("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },
    // Cross-media shared-frame detection — near-dup VIDEO detection the way
    // production pipelines do it (frame-level content addressing): mm3's
    // sampled frames keyed by their digest; a frame is SHARED when it occurs
    // in ≥ 2 distinct media. Per media: frame count, shared-frame count, and
    // the share ratio — the re-encoded/clipped-copy score that mm5's
    // whole-blob digest cannot see (any container change breaks the blob
    // hash; the frames survive). Scale shape: the digest aggregate and the
    // join back both exchange on frame_hex — (hex, count) rows, never media
    // bytes — and the per-doc rollup reuses the doc_id exchange; the
    // distinct-doc count is a partial-aggregating groupBy, not a window.
    "mm8_frame_dedup" -> { (s, d) =>
      val frames = mediaTable(s, d)
        .select(col("doc_id"), col("media"), length(col("media")).as("len"))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, int((len - 1) / 64)), i -> hex(substring(media, i * 64 + 1, 32)))"))
          .as("frame_hex"))
      val nd = frames.groupBy(col("frame_hex"))
        .agg(countDistinct(col("doc_id")).as("ndocs"))
      frames.join(nd, "frame_hex")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).cast("bigint").as("n_shared"))
        .withColumn("share_ratio",
          col("n_shared").cast("double") / col("n_frames").cast("double"))
        .orderBy(col("doc_id"))
    },
    // Scene-cut detection: a video's scene boundaries are where the frame
    // CONTENT changes — with mm8's frame-level content addressing that is
    // a run-length problem over the in-order digest sequence (e21's
    // gaps-and-islands applied to the frame axis). Per media: scene count,
    // frame count, the longest scene, and the first cut's frame index
    // (NULL for single-scene media) — the shot-table a video training
    // pipeline samples from (one keyframe per scene beats mm3's fixed
    // stride when content is static). Digests are exact bytes on both
    // engines, so the whole report is hash-oracled — no codec in the
    // loop. Scale shape: ONE doc_id exchange feeds the lag window, the
    // run numbering, and BOTH rollups (hashpartitioning(doc_id) satisfies
    // the (doc_id, scene) clustering); the exchange carries 64-hex digests
    // and frame indexes, never media bytes (mm8's rule).
    "mm9_scene_cuts" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      val frames = mediaTable(s, d)
        .select(col("doc_id"), col("media"), length(col("media")).as("len"))
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, int((len - 1) / 64)), i -> hex(substring(media, i * 64 + 1, 32)))"))
          .as(Seq("i", "frame_hex")))
      val prev = lag(col("frame_hex"), 1).over(byDoc)
      frames
        .withColumn("chg",
          when(prev.isNull || col("frame_hex") =!= prev, 1L).otherwise(0L))
        .withColumn("scene", sum(col("chg")).over(
          byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("doc_id"), col("scene"))
        .agg(count(lit(1)).as("scene_len"), min(col("i")).as("scene_start"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("bigint").as("n_scenes"),
          sum(col("scene_len")).cast("bigint").as("n_frames"),
          max(col("scene_len")).cast("bigint").as("longest_scene"),
          min(when(col("scene") === 2, col("scene_start"))).cast("bigint")
            .as("first_cut_idx"))
        .orderBy(col("doc_id"))
    }
  )

  def oracle: Map[String, String] = Map(
    "mm1_media_table" ->
      s"""SELECT doc_id, hex(encode(text)) AS media_hex,
        |  to_json({'format': 'jpeg',
        |           'width': CAST(64 + doc_id % 512 AS INT),
        |           'height': CAST(64 + doc_id % 256 AS INT)}) AS meta,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  md5(text) AS digest
        |FROM ${graft.Tables.validDocsSql} documents ORDER BY doc_id""".stripMargin,
    // The decoded features are exact integers, and PNG is lossless, so the
    // oracle recomputes them from the pattern arithmetic directly:
    // v(x,y,id) = (31x + 17y + 7·id) mod 256, gray ⇒ rgb sum = 3·Σv.
    // Spark's side went bytes → ImageIO decode → pixels; any codec bug
    // (stride, channel order, geometry) breaks the hash.
    "mm2_decode_features" ->
      s"""WITH m AS (SELECT doc_id,
        |    CAST(16 + doc_id % 49 AS INT) AS w,
        |    CAST(12 + doc_id % 37 AS INT) AS h
        |  FROM ${graft.Tables.validDocsSql} documents)
        |SELECT doc_id, w AS width, h AS height, CAST(w * h AS INT) AS n_px,
        |  CAST(3 * list_sum(list_transform(range(w * h),
        |    p -> (31 * (p % w) + 17 * (p // w) + 7 * (doc_id % 256)) % 256)) AS BIGINT) AS pix_sum
        |FROM m ORDER BY doc_id""".stripMargin,
    // Box-fit geometry and the nearest-neighbor source mapping are floor
    // division on both engines: thumb pixel (i, j) samples source
    // (i·w // out_w, j·h // out_h), whose pattern value the oracle
    // recomputes — the full decode → rescale → feature pipeline mirrored.
    "mm4_resize" ->
      s"""WITH m AS (SELECT doc_id,
        |    CAST(16 + doc_id % 49 AS INT) AS w,
        |    CAST(12 + doc_id % 37 AS INT) AS h
        |  FROM ${graft.Tables.validDocsSql} documents),
        |g AS (SELECT doc_id, w, h,
        |    CAST(w * 16 // greatest(w, h) AS INT) AS out_w,
        |    CAST(h * 16 // greatest(w, h) AS INT) AS out_h
        |  FROM m)
        |SELECT doc_id, w, h, out_w, out_h,
        |  CAST(out_w * out_h AS INT) AS n_thumb_px,
        |  CAST(3 * list_sum(list_transform(range(out_w * out_h),
        |    p -> (31 * ((p % out_w) * w // out_w)
        |        + 17 * ((p // out_w) * h // out_h)
        |        + 7 * (doc_id % 256)) % 256)) AS BIGINT) AS thumb_pix_sum
        |FROM g ORDER BY doc_id""".stripMargin,
    // ASCII corpus ⇒ byte and character offsets agree, so the blob slicing
    // is mirrored with VARCHAR substring (DuckDB 1.0 has no md5(BLOB)).
    // range() takes constants only: 16 frames covers max len 577 ≪ 16·64.
    "mm3_frame_sample" ->
      s"""WITH m AS (SELECT doc_id, hex(encode(text)) AS h,
        |                  octet_length(encode(text)) AS len FROM ${graft.Tables.validDocsSql} documents),
        |f AS (SELECT doc_id,
        |             unnest(generate_series(0, greatest((len - 1) // 64, 0))) AS frame_idx,
        |             h FROM m)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  substring(h, CAST(frame_idx * 128 + 1 AS BIGINT), 64) AS frame_hex
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "mm5_blob_dedup" ->
      s"""SELECT md5(text) AS digest, min(doc_id) AS canonical_id,
        |  count(*) AS n_refs,
        |  CAST(max(octet_length(encode(text))) AS BIGINT) AS blob_bytes,
        |  CAST(sum(octet_length(encode(text))) - max(octet_length(encode(text))) AS BIGINT) AS bytes_saved
        |FROM ${graft.Tables.validDocsSql} documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "mm6_storage_profile" ->
      s"""WITH b AS (
        |  SELECT source, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM ${graft.Tables.validDocsSql} documents)
        |SELECT source, count(*) AS n,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  quantile_cont(n_bytes, 0.25) AS p25_bytes,
        |  quantile_cont(n_bytes, 0.5) AS p50_bytes,
        |  quantile_cont(n_bytes, 0.75) AS p75_bytes,
        |  max(n_bytes) AS max_bytes
        |FROM b GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    // Mirrors mm7 through the same hex dump: hex() names each byte
    // identically on both engines, md5(VARCHAR) hashes the hex string's
    // UTF-8 bytes exactly like Spark's md5(CAST(hex AS BINARY)).
    "mm7_chunk_manifest" ->
      s"""WITH m AS (
        |  SELECT doc_id, hex(encode(text)) AS h,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM ${graft.Tables.validDocsSql} documents),
        |c AS (
        |  SELECT doc_id, h, CAST((n_bytes + 2047) // 2048 AS INT) AS n_chunks
        |  FROM m WHERE n_bytes > 0),
        |f AS (
        |  SELECT doc_id, n_chunks,
        |    unnest(generate_series(0, n_chunks - 1)) AS chunk_idx, h
        |  FROM c)
        |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, n_chunks,
        |  CAST(chunk_idx * 2048 AS BIGINT) AS offset_bytes,
        |  CAST(length(substring(h, CAST(chunk_idx * 4096 + 1 AS BIGINT), 4096)) // 2 AS BIGINT) AS chunk_bytes,
        |  md5(substring(h, CAST(chunk_idx * 4096 + 1 AS BIGINT), 4096)) AS chunk_md5
        |FROM f ORDER BY doc_id, chunk_idx""".stripMargin,
    // mm3's frame CTE verbatim (byte windows through the hex dump), then
    // the digest-count aggregate and the per-doc rollup.
    "mm8_frame_dedup" ->
      s"""WITH m AS (SELECT doc_id, hex(encode(text)) AS h,
        |                  octet_length(encode(text)) AS len FROM ${graft.Tables.validDocsSql} documents),
        |f AS (SELECT doc_id,
        |             substring(h, CAST(i * 128 + 1 AS BIGINT), 64) AS frame_hex
        |      FROM (SELECT doc_id, h,
        |              unnest(generate_series(0, greatest((len - 1) // 64, 0))) AS i
        |            FROM m) t),
        |nd AS (SELECT frame_hex, count(DISTINCT doc_id) AS ndocs FROM f GROUP BY 1)
        |SELECT f.doc_id, count(*) AS n_frames,
        |  CAST(sum(CASE WHEN nd.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |  CAST(CAST(sum(CASE WHEN nd.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS share_ratio
        |FROM f JOIN nd USING (frame_hex)
        |GROUP BY f.doc_id ORDER BY f.doc_id""".stripMargin,
    // Run-length semantics over the same frame geometry as mm8: a scene
    // is a maximal run of equal consecutive digests; the cut index is
    // scene 2's first frame.
    "mm9_scene_cuts" ->
      s"""WITH m AS (SELECT doc_id, hex(encode(text)) AS h,
        |                  octet_length(encode(text)) AS len FROM ${graft.Tables.validDocsSql} documents),
        |f AS (SELECT doc_id, i,
        |             substring(h, CAST(i * 128 + 1 AS BIGINT), 64) AS frame_hex
        |      FROM (SELECT doc_id, h,
        |              unnest(generate_series(0, greatest((len - 1) // 64, 0))) AS i
        |            FROM m) t),
        |r AS (SELECT doc_id, i, frame_hex,
        |        CASE WHEN lag(frame_hex) OVER w IS NULL
        |               OR frame_hex <> lag(frame_hex) OVER w THEN 1 ELSE 0 END AS chg
        |      FROM f WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
        |sc AS (SELECT doc_id, i,
        |         sum(chg) OVER (PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING) AS scene
        |       FROM r),
        |g AS (SELECT doc_id, scene, count(*) AS scene_len, min(i) AS scene_start
        |      FROM sc GROUP BY 1, 2)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scenes,
        |  CAST(sum(scene_len) AS BIGINT) AS n_frames,
        |  CAST(max(scene_len) AS BIGINT) AS longest_scene,
        |  CAST(min(CASE WHEN scene = 2 THEN scene_start END) AS BIGINT) AS first_cut_idx
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
