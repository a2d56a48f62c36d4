package graft

/** The multimodal decode pipeline must derive its outputs from REAL
  * `javax.imageio` decode of the binary payload — these tests pin that the
  * values are pixel-derived (closed-form Σ(x+y) over the raster), not
  * generator echoes, and that both codec arms (PNG, BMP) round-trip. */
class CodecSpec extends SparkTestBase {

  /** Closed-form pixel sum of the fixture image: Σ_{x<w,y<h} (x+y), exact
    * because max(x+y) = 84 < 256 so the mod in the generator never wraps. */
  private def pxSum(w: Long, h: Long): Long = h * w * (w - 1) / 2 + w * h * (h - 1) / 2

  test("mm_decode_pipeline: decoded sums match the closed form for both codecs") {
    val rows = SparkEntry.queries("mm_decode_pipeline")(spark, SfDir).collect()
    assert(rows.map(_.getString(0)).toSet == Set("image/bmp", "image/png"))
    // recompute the expectation from doc_ids alone (the oracle's formula)
    val ids = Tables.documents(spark, SfDir).select("doc_id")
      .collect().map(_.getLong(0))
    val expect = ids.groupBy(id => if (id % 2 == 0) "image/png" else "image/bmp")
      .map { case (kind, ks) =>
        kind -> (ks.length.toLong,
          ks.map(id => 16 + id % 32).sum, ks.map(id => 16 + id % 24).sum,
          ks.map(id => pxSum(16 + id % 32, 16 + id % 24)).sum)
      }
    rows.foreach { r =>
      val (n, sw, sh, sp) = expect(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == sw && r.getLong(3) == sh,
        s"dims mismatch for ${r.getString(0)}")
      assert(r.getLong(4) == sp, s"pixel sum mismatch for ${r.getString(0)} — " +
        "decode is not reading the real raster")
    }
  }

  test("ImageIO round-trip is lossless for the grayscale fixture (png and bmp)") {
    for (fmt <- Seq("png", "bmp")) {
      val (w, h) = (23, 17)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (x <- 0 until w; y <- 0 until h)
        img.getRaster.setSample(x, y, 0, (x + y) % 256)
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, baos), s"no JDK writer for $fmt")
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(baos.toByteArray))
      assert(back.getWidth == w && back.getHeight == h)
      var sum = 0L
      for (x <- 0 until w; y <- 0 until h) sum += back.getRaster.getSample(x, y, 0)
      assert(sum == pxSum(w, h), s"$fmt round-trip altered pixels")
    }
  }
}
