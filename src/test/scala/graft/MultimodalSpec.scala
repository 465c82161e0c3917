package graft

import graft.functions.Images

/** Real-codec goldens for the multimodal decode path.
  *
  * The reference carries base64 JPEG data-URIs through HSTORE values
  * (`/root/reference/tests/test_dbsink.py:1034-1048`, fixtures in
  * `tests/base64_images.json`); these tests run the engine's actual decoder
  * ([[Images.decode]] = `javax.imageio.ImageIO.read`) over those exact
  * payloads and pin the decoded geometry + RGB pixel sums, so the decode
  * used by mm2/mm4 is proven against real-world image bytes, not only the
  * synthetic PNG corpus the oracle covers. */
class MultimodalSpec extends SparkTestBase {

  /** Extract the base64 payloads of every `data:image/...` value in the
    * reference fixture file, in document order. */
  private def fixtureImages(): Seq[Array[Byte]] = {
    val raw = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/root/reference/tests/base64_images.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    "data:image/[a-zA-Z]+;base64,([A-Za-z0-9+/=]+)".r
      .findAllMatchIn(raw).map(m => java.util.Base64.getDecoder.decode(m.group(1)))
      .toSeq
  }

  test("reference JPEG fixtures decode to pinned width/height/pixel-sum goldens") {
    val imgs = fixtureImages()
    assert(imgs.length == 3, s"expected 3 data-URI images, found ${imgs.length}")
    // Goldens computed with JDK 17's ImageIO (the decoder under test).
    // Dimensions are bit-specified by the JPEG header and pinned exactly;
    // pixel sums are NOT bit-specified (the IDCT is implementation-defined
    // within IEEE 1180 tolerances), so a JDK/ImageIO update may legitimately
    // shift each pixel by a count or two — compare within |Δ| ≤ n_px so the
    // pin survives a decoder upgrade while still catching real codec bugs
    // (a channel swap, stride error, or resize regression shifts sums by
    // orders of magnitude more than 1/pixel).
    val golden = Seq((50, 50, 1252974L), (50, 50, 982209L), (100, 100, 1925940L))
    imgs.zip(golden).zipWithIndex.foreach { case ((bytes, (w, h, sum)), i) =>
      val img = Images.decode(bytes).getOrElse(fail(s"fixture $i failed to decode"))
      val (s, n) = Images.rgbSum(img)
      assert((img.getWidth, img.getHeight) == ((w, h)),
        s"fixture $i: got ${img.getWidth}x${img.getHeight}, want ${w}x$h")
      assert(math.abs(s - sum) <= n,
        s"fixture $i: pixel sum $s drifted more than $n from golden $sum")
      assert(n == w * h)
    }
  }

  test("PNG encode -> ImageIO decode round-trips the pattern bit-for-bit") {
    Seq(0L, 1L, 17L, 255L, 4096L).foreach { id =>
      val img = Images.decode(Images.encodePatternPng(id))
        .getOrElse(fail(s"pattern PNG for id=$id failed to decode"))
      assert(img.getWidth == Images.patternWidth(id))
      assert(img.getHeight == Images.patternHeight(id))
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val v = Images.patternValue(x, y, id)
          assert((img.getRGB(x, y) & 0xffffff) == ((v << 16) | (v << 8) | v),
            s"pixel ($x, $y) of id=$id drifted through the codec")
          x += 1
        }
        y += 1
      }
    }
  }

  test("mm9 scene cuts: static media is one scene; the cut index is scene 2's first frame") {
    val dir = java.nio.file.Files.createTempDirectory("mm9").toString
    val spark0 = spark
    import spark0.implicits._
    // doc 1: 300 identical bytes ⇒ 5 frames, all digests equal ⇒ 1 scene,
    // no cut. doc 2: frame contents A | B B | C ⇒ 3 scenes, longest 2,
    // first cut at frame index 1 (the trailing 12-byte partial frame is
    // its own scene — content addressing sees the bytes, not the stride).
    Seq((1L, "A" * 300), (2L, "A" * 64 + "B" * 128 + "C" * 12))
      .map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("mm9_scene_cuts")(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        if (x.isNullAt(4)) None else Some(x.getLong(4)))).toSeq
    assert(r == Seq((1L, 1L, 5L, 5L, None), (2L, 3L, 4L, 2L, Some(1L))),
      s"got ${r.mkString("; ")}")
  }

  test("non-image payloads decode to None (dead-letter contract, not a throw)") {
    assert(Images.decode("not an image".getBytes).isEmpty)
    assert(Images.decode(Array.emptyByteArray).isEmpty)
  }

  test("box-fit rescale: geometry and nearest-neighbor sampling are exact") {
    val id = 42L
    val img = Images.decode(Images.encodePatternPng(id)).get
    val thumb = Images.resizeBoxFit(img, 16)
    val (w, h) = (img.getWidth, img.getHeight)
    val m = math.max(w, h)
    assert(thumb.getWidth == w * 16 / m && thumb.getHeight == h * 16 / m)
    // Every thumb pixel equals the pattern value at its floor-mapped source.
    var j = 0
    while (j < thumb.getHeight) {
      var i = 0
      while (i < thumb.getWidth) {
        val v = Images.patternValue(i * w / thumb.getWidth, j * h / thumb.getHeight, id)
        assert((thumb.getRGB(i, j) & 0xffffff) == ((v << 16) | (v << 8) | v))
        i += 1
      }
      j += 1
    }
  }
}
