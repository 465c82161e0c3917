package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real JDK image codec for the multimodal operators (mm2/mm4): decode is
  * `javax.imageio.ImageIO.read` — the same path that decodes the reference's
  * base64 JPEG data-URIs (`/root/reference/tests/test_dbsink.py:1034-1048`,
  * fixtures in `tests/base64_images.json`; MultimodalSpec pins their decoded
  * width/height/pixel-sum goldens). Features are exact integers (pixel sums,
  * geometry), so the DuckDB oracle can recompute them arithmetically for the
  * deterministic pattern corpus while the decode path itself stays real.
  *
  * Everything here is per-row driver-free work that runs inside
  * `mapPartitions` batches — at scale each operator is a narrow map over the
  * corpus; image bytes never shuffle.
  */
object Images {

  // ImageIO's default stream cache is DISK-backed: every read/write of an
  // InputStream/OutputStream spins up (and deletes) a temp FILE. For
  // KB-sized in-memory payloads that is pure filesystem-metadata overhead,
  // and it COMPOUNDS under parallelism — measured r8 at sf10: mm4 ran 27×
  // per 10× data (500k docs × encode+decode × 32 threads hammering one tmp
  // dir) where the codec work itself is linear. Memory-cached streams are
  // the correct choice for byte-array codecs at any scale; after this
  // switch mm2/mm4 scale linearly (see BENCHNOTES r8).
  ImageIO.setUseCache(false)

  /** Deterministic gray test pattern: v(x, y, id) = (31x + 17y + 7·id) mod
    * 256. Chosen to be exactly re-computable in the DuckDB oracle (integer
    * arithmetic only) while exercising a real PNG encode→decode round trip
    * (PNG is lossless, so decoded pixels equal the generated pattern
    * bit-for-bit). */
  def patternValue(x: Int, y: Int, id: Long): Int =
    // Mod the id FIRST: 7·id wraps Long for 19-digit ids and Java % keeps
    // the wrapped sign, so the raw form painted garbage channels exactly
    // where the DuckDB twin (which raises on the overflow instead)
    // couldn't check it. floorMod keeps the identity total for any id.
    ((31L * x + 17L * y + 7L * java.lang.Math.floorMod(id, 256L)) % 256L).toInt

  /** Pattern image geometry: width 16–64, height 12–48 — small enough that
    * the oracle's per-row pixel list stays cheap, big enough that box-fit
    * always downscales (max(w,h) >= box).
    *
    * Parity invariant: the DuckDB oracles compute `doc_id % N` with
    * sign-PRESERVING semantics while [[patternValue]] uses floorMod — the
    * two agree only for non-negative ids. Every corpus (including the
    * 19-digit adversarial row) keeps doc_id ≥ 0; guard it here so a future
    * negative id fails loudly at generation instead of silently diverging
    * between the engines (and producing a non-positive width/height). */
  def patternWidth(id: Long): Int = {
    require(id >= 0, s"pattern ids must be non-negative (oracle % parity): $id")
    (16 + id % 49).toInt
  }
  def patternHeight(id: Long): Int = {
    require(id >= 0, s"pattern ids must be non-negative (oracle % parity): $id")
    (12 + id % 37).toInt
  }

  /** Encode the id-keyed gray pattern as a real PNG via ImageIO. Pixels go
    * in through the bulk setRGB overload — per-pixel setRGB pays a
    * colorspace conversion call per pixel, ~10× slower for identical
    * output ints. */
  def encodePatternPng(id: Long): Array[Byte] = {
    val w = patternWidth(id)
    val h = patternHeight(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = patternValue(x, y, id)
        px(y * w + x) = (v << 16) | (v << 8) | v
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real decode. None when the payload is not a decodable image — ImageIO
    * returns null rather than throwing for unknown formats, which is the
    * contract a 100 TB media scan wants (corrupt blobs are data, not
    * exceptions; callers decide whether to dead-letter or fail). */
  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    Option(ImageIO.read(new ByteArrayInputStream(bytes)))

  /** Exact-integer feature pair: sum of the three sRGB channels over every
    * pixel, plus the pixel count. For the gray pattern this is 3·Σv. Bulk
    * getRGB — one conversion pass instead of one call per pixel; the ints
    * are identical to the per-pixel overload's. */
  def rgbSum(img: BufferedImage): (Long, Int) = {
    val w = img.getWidth
    val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var s = 0L
    var i = 0
    while (i < px.length) {
      val rgb = px(i)
      s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
      i += 1
    }
    (s, w * h)
  }

  /** Aspect-preserving box-fit rescale on the decoded BufferedImage:
    * out = (w, h) · box / max(w, h), nearest-neighbor with pure integer
    * source mapping src = (i · in) div out — floor division on both engines,
    * so the oracle mirrors the resample exactly (no filter-kernel floats). */
  def resizeBoxFit(img: BufferedImage, box: Int): BufferedImage = {
    val w = img.getWidth
    val h = img.getHeight
    val m = math.max(w, h)
    val ow = math.max(1, w * box / m)
    val oh = math.max(1, h * box / m)
    val out = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
    val src = img.getRGB(0, 0, w, h, null, 0, w)
    val dst = new Array[Int](ow * oh)
    var j = 0
    while (j < oh) {
      val sy = j * h / oh
      var i = 0
      while (i < ow) {
        dst(j * ow + i) = src(sy * w + i * w / ow)
        i += 1
      }
      j += 1
    }
    out.setRGB(0, 0, ow, oh, dst, 0, ow)
    out
  }
}
