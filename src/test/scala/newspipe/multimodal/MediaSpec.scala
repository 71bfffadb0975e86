package newspipe.multimodal

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** §7 extension: multimodal plumbing — schema, per-partition batch shape,
  * and the deterministic stub kernels.
  */
class MediaSpec extends SparkTestBase {
  import spark.implicits._

  test("synthetic media is deterministic and schema-complete") {
    val a = Media.synthetic(spark, 50L)
    val b = Media.synthetic(spark, 50L)
    a.schema.fieldNames shouldBe Array("media_id", "kind", "payload", "meta")
    a.select("kind").distinct().as[String].collect().sorted shouldBe
      Array("audio", "image", "video")
    val pa = a.select(md5($"payload")).as[String].collect().sorted
    val pb = b.select(md5($"payload")).as[String].collect().sorted
    pa shouldBe pb
  }

  test("extractFeatures: fixed dim, unit norm, one row per input") {
    val media = Media.synthetic(spark, 30L)
    val feats = Media.extractFeatures(media, dim = 8).collect()
    feats.length shouldBe 30
    feats.foreach { f =>
      f.feature.length shouldBe 8
      val norm = math.sqrt(f.feature.map(x => x.toDouble * x).sum)
      norm shouldBe 1.0 +- 1e-5
      f.n_bytes should be > 0L
    }
  }

  test("resizeImages: dimensions bounded, aspect preserved, only images touched") {
    val media = Media.synthetic(spark, 60L)
    val resized = Media.resizeImages(media, maxW = 128, maxH = 128)
    resized.select("kind").distinct().as[String].collect() shouldBe Array("image")
    val dims = resized.select($"meta.width", $"meta.height").as[(Int, Int)].collect()
    dims.foreach { case (w, h) =>
      w should be <= 128
      h should be <= 128
    }
  }

  // ---- real P6 PPM path -----------------------------------------------------

  /** Build a real binary P6: left half red, right half blue. */
  private def ppmBytes(w: Int, h: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      if (x < w / 2) rgb(i) = 0xff.toByte else rgb(i + 2) = 0xff.toByte
    }
    Ppm.encode(Ppm.Image(w, h, rgb))
  }

  test("Ppm codec: decode(encode) round-trips; comments and bad inputs handled") {
    val img = Ppm.decode(ppmBytes(6, 4)).get
    img.width shouldBe 6
    img.height shouldBe 4
    Ppm.decode(Ppm.encode(img)).get.rgb shouldBe img.rgb
    // header comments are legal P6
    val withComment = ("P6\n# a comment\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5, 6))
    Ppm.decode(withComment).map(i => (i.width, i.height)) shouldBe Some((2, 1))
    // truncated raster, wrong magic, unsupported maxval → None, never a throw
    Ppm.decode("P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2)) shouldBe None
    Ppm.decode("P5\n2 1\n255\n12".getBytes("US-ASCII")) shouldBe None
    Ppm.decode("P6\n2 1\n65535\n123456".getBytes("US-ASCII")) shouldBe None
    Ppm.decode(null) shouldBe None
  }

  test("resizeImages takes the REAL path for P6 payloads: decoded dims, resampled pixels") {
    val media = Seq(Media.MediaRow(1L, "image", ppmBytes(8, 4),
      // meta deliberately WRONG (payload is the truth on the real path)
      Media.MediaMeta(Some(999), Some(999), Some("ppm"), None))).toDF()
    val out = Media.resizeImages(media, maxW = 4, maxH = 4)
      .as[Media.MediaRow].head()
    out.meta.width shouldBe Some(4)
    out.meta.height shouldBe Some(2)  // aspect preserved: 8x4 → 4x2
    val img = Ppm.decode(out.payload).get
    img.width shouldBe 4
    img.height shouldBe 2
    // left half still red, right half still blue after nearest-neighbor
    val px = img.rgb.grouped(3).toArray
    (px(0)(0) & 0xff) shouldBe 255 // (0,0) red
    (px(3)(2) & 0xff) shouldBe 255 // (3,0) blue
    // never upscales
    val same = Media.resizeImages(media, maxW = 64, maxH = 64)
      .as[Media.MediaRow].head()
    Ppm.decode(same.payload).get.width shouldBe 8
  }

  test("extractFeatures takes the REAL path for P6: spatial luminance bands, unit norm") {
    // top half white, bottom half black → first bands bright, last dark
    val w = 4; val h = 8
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h / 2; i <- y * w * 3 until (y + 1) * w * 3)
      rgb(i) = 0xff.toByte
    val payload = Ppm.encode(Ppm.Image(w, h, rgb))
    val media = Seq(Media.MediaRow(1L, "image", payload,
      Media.MediaMeta(Some(w), Some(h), Some("ppm"), None))).toDF()
    val f = Media.extractFeatures(media, dim = 4).head().feature
    f.length shouldBe 4
    math.sqrt(f.map(x => x.toDouble * x).sum) shouldBe 1.0 +- 1e-5
    f(0) should be > 0.5f  // white band
    f(3) shouldBe 0.0f     // black band
  }

  test("null payloads: resize passes rows through, sampleFrames emits nothing, features are zero-safe") {
    val rows = Seq(
      Media.MediaRow(1L, "image", null, Media.MediaMeta(Some(8), Some(4), Some("png"), None)),
      Media.MediaRow(2L, "video", null, Media.MediaMeta(None, None, Some("mp4"), Some(5000L))),
      Media.MediaRow(3L, "audio", null, Media.MediaMeta(None, None, Some("wav"), Some(1000L)))
    ).toDF()
    Media.resizeImages(rows, 4, 4).count() shouldBe 1 // image row survives untouched
    Media.sampleFrames(rows).count() shouldBe 0
    // empty (present-but-zero-byte) payloads are the same no-frames case
    val empty = Seq(Media.MediaRow(4L, "video", Array.empty[Byte],
      Media.MediaMeta(None, None, Some("mp4"), Some(8000L)))).toDF()
    Media.sampleFrames(empty).count() shouldBe 0
    val f = Media.extractFeatures(rows, dim = 4).collect()
    f.length shouldBe 3
    f.foreach(_.n_bytes shouldBe 0L)
  }

  test("sampleFrames: explode shape — ≥1 frame per video, ≤ maxFrames") {
    val media = Media.synthetic(spark, 60L)
    val frames = Media.sampleFrames(media, everyMs = 1000L, maxFrames = 8)
    val perVideo = frames.groupBy("media_id").count().as[(Long, Long)].collect()
    perVideo.length shouldBe media.filter($"kind" === "video").count()
    perVideo.foreach { case (_, n) =>
      n should be >= 1L
      n should be <= 8L
    }
  }
}
