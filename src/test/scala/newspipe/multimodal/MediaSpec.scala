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
    // never upscales — and the no-op branch STILL rewrites meta from the
    // decoded truth (the planted 999×999 "ppm" meta must not survive)
    val same = Media.resizeImages(media, maxW = 64, maxH = 64)
      .as[Media.MediaRow].head()
    Ppm.decode(same.payload).get.width shouldBe 8
    same.meta.width shouldBe Some(8)
    same.meta.height shouldBe Some(4)
    same.meta.format shouldBe Some("ppm")
  }

  // ---- real baseline-PNG path ----------------------------------------------

  /** Wrap a raw (filtered) scanline stream into a minimal PNG container.
    * CRCs are zeroed — the decoder relies on zlib integrity, not chunk CRCs —
    * so this helper shares no code with Png.encode.
    */
  private def pngContainer(w: Int, h: Int, colorType: Int, raw: Array[Byte]): Array[Byte] = {
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length * 2 + 64)
    val n = deflater.deflate(buf)
    deflater.end()
    val idat = buf.take(n)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a), 0, 8)
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(t: String, d: Array[Byte]): Unit = {
      out.write(be32(d.length), 0, 4)
      out.write(t.getBytes("US-ASCII"), 0, 4)
      out.write(d, 0, d.length)
      out.write(Array[Byte](0, 0, 0, 0), 0, 4) // CRC unvalidated
    }
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, colorType.toByte, 0, 0, 0))
    chunk("IDAT", idat)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** Forward-apply a PNG scanline filter (the inverse of the decoder's
    * defilter), written independently from the spec.
    */
  private def forwardFilter(filter: Int, row: Array[Byte], prev: Array[Byte],
      bpp: Int): Array[Byte] = {
    val out = new Array[Byte](row.length + 1)
    out(0) = filter.toByte
    for (x <- row.indices) {
      val a = if (x >= bpp) row(x - bpp) & 0xff else 0
      val b = if (prev != null) prev(x) & 0xff else 0
      val c = if (x >= bpp && prev != null) prev(x - bpp) & 0xff else 0
      val pred = filter match {
        case 0 => 0
        case 1 => a
        case 2 => b
        case 3 => (a + b) >> 1
        case 4 =>
          val p = a + b - c
          val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
          if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
      }
      out(x + 1) = ((row(x) & 0xff) - pred).toByte
    }
    out
  }

  test("Png codec: encode/decode round-trips RGB exactly") {
    val img = Ppm.decode(ppmBytes(6, 4)).get
    val png = Png.encode(img)
    png.take(4) shouldBe Array[Byte](0x89.toByte, 'P', 'N', 'G')
    val back = Png.decode(png).get
    back.width shouldBe 6
    back.height shouldBe 4
    back.rgb shouldBe img.rgb
  }

  test("Png decode: all five scanline filters reconstruct the same pixels") {
    val w = 5; val h = 5; val bpp = 3
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 251).toByte)
    val rows = rgb.grouped(w * bpp).toArray
    for (filters <- Seq(Seq(0, 1, 2, 3, 4), Seq(4, 4, 3, 1, 2))) {
      val raw = new java.io.ByteArrayOutputStream()
      var prev: Array[Byte] = null
      for ((row, y) <- rows.zipWithIndex) {
        raw.write(forwardFilter(filters(y), row, prev, bpp))
        prev = row
      }
      val decoded = Png.decode(pngContainer(w, h, 2, raw.toByteArray))
      decoded.map(_.rgb.toSeq) shouldBe Some(rgb.toSeq)
    }
  }

  test("Png decode: gray and alpha color types convert to RGB (alpha dropped)") {
    // 2x2 grayscale (colorType 0): values 10,20,30,40
    val grayRaw = Array[Byte](0, 10, 20, 0, 30, 40)
    val gray = Png.decode(pngContainer(2, 2, 0, grayRaw)).get
    gray.rgb shouldBe Array[Byte](10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40)
    // 2x1 RGBA (colorType 6): alpha dropped
    val rgbaRaw = Array[Byte](0, 1, 2, 3, 99.toByte, 4, 5, 6, 7)
    Png.decode(pngContainer(2, 1, 6, rgbaRaw)).get.rgb shouldBe
      Array[Byte](1, 2, 3, 4, 5, 6)
    // 1x1 gray+alpha (colorType 4)
    Png.decode(pngContainer(1, 1, 4, Array[Byte](0, 77, 12))).get.rgb shouldBe
      Array[Byte](77, 77, 77)
  }

  test("Png decode: rejects non-baseline and corrupt inputs, never throws") {
    val img = Ppm.decode(ppmBytes(4, 4)).get
    val good = Png.encode(img)
    Png.decode(null) shouldBe None
    Png.decode(Array[Byte](1, 2, 3)) shouldBe None
    Png.decode(good.dropRight(20)) shouldBe None       // truncated
    Png.decode(good.take(40)) shouldBe None            // no IDAT/IEND
    val palette = good.clone; palette(8 + 8 + 9) = 3   // colorType 3 (palette)
    Png.decode(palette) shouldBe None
    val interlaced = good.clone; interlaced(8 + 8 + 12) = 1
    Png.decode(interlaced) shouldBe None
    val depth16 = good.clone; depth16(8 + 8 + 8) = 16
    Png.decode(depth16) shouldBe None
    // corrupted zlib body: flip a byte mid-IDAT
    val corrupt = good.clone; corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x5a).toByte
    Png.decode(corrupt) // must not throw (None or garbage-free image)
  }

  test("resizeImages takes the REAL path for PNG payloads, container-preserving") {
    val img = Ppm.decode(ppmBytes(8, 4)).get
    val media = Seq(Media.MediaRow(1L, "image", Png.encode(img),
      Media.MediaMeta(Some(999), Some(999), Some("jpeg"), None))).toDF()
    val out = Media.resizeImages(media, maxW = 4, maxH = 4)
      .as[Media.MediaRow].head()
    out.meta.width shouldBe Some(4)
    out.meta.height shouldBe Some(2)
    out.meta.format shouldBe Some("png") // re-encoded in the SAME container
    val back = Png.decode(out.payload).get
    back.width shouldBe 4
    back.height shouldBe 2
    // left red / right blue preserved through png → resample → png
    (back.rgb(0) & 0xff) shouldBe 255
    (back.rgb(3 * 3 + 2) & 0xff) shouldBe 255
    // no-op branch: meta corrected from decode, payload byte-identical
    val same = Media.resizeImages(media, maxW = 64, maxH = 64)
      .as[Media.MediaRow].head()
    same.meta.width shouldBe Some(8)
    same.meta.format shouldBe Some("png")
    same.payload shouldBe Png.encode(img)
  }

  test("syntheticReal + imagePixelSums: closed-form round-trip witness") {
    val media = Media.syntheticReal(spark, 40L)
    val sums = Media.imagePixelSums(media).as[(Long, Int, Int, Long)].collect()
    sums.length shouldBe 40
    sums.foreach { case (id, w, h, s) =>
      w shouldBe (id % 23 + 3).toInt
      h shouldBe (id % 17 + 3).toInt
      val csum = (id % 200 + 20) + (id * 7 % 200 + 20) + (id * 13 % 200 + 20)
      s shouldBe w * h * csum
    }
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

  test("Wav codec: 16-bit PCM encode/decode round-trips exactly; bad input None") {
    val samples = Array.tabulate(1000)(i => ((i * 37) % 2003 - 1001).toShort)
    val a = Wav.Audio(8000, 1, samples)
    val bytes = Wav.encode(a)
    val back = Wav.decode(bytes).get
    back.sampleRate shouldBe 8000
    back.channels shouldBe 1
    back.frames shouldBe 1000
    back.samples shouldBe samples // lossless container
    back.durationMs shouldBe 125L // 1000 / 8000 s
    // stereo interleave round-trips too (field-wise: Audio holds an Array)
    val st = Wav.Audio(44100, 2, Array.tabulate(400)(i => (i - 200).toShort))
    val stBack = Wav.decode(Wav.encode(st)).get
    stBack.sampleRate shouldBe 44100
    stBack.channels shouldBe 2
    stBack.samples shouldBe st.samples
    Wav.decode("not a wav".getBytes) shouldBe None
    Wav.decode(Array.empty[Byte]) shouldBe None
  }

  test("Wav.resample: closed-form nearest-frame math, both directions") {
    val a = Wav.Audio(8000, 1,
      Array.tabulate(100)(i => (i * 3).toShort))
    val down = Wav.resample(a, 4000)
    down.sampleRate shouldBe 4000
    down.frames shouldBe 50
    // frame i = source frame 2i
    down.samples.toSeq shouldBe (0 until 50).map(i => (2 * i * 3).toShort)
    val up = Wav.resample(a, 16000)
    up.frames shouldBe 200
    up.samples.toSeq shouldBe (0 until 200).map(i => ((i / 2) * 3).toShort)
    Wav.resample(a, 8000) shouldBe a // identity
  }

  test("resampleAudio takes the REAL path for WAV payloads; decoded truth wins") {
    val media = Media.syntheticRealWav(spark, 40)
    val out = Media.resampleAudio(media, 4000)
    val stats = Media.audioStats(out).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(3), r.getLong(4))))
      .toMap
    (0L until 40L).foreach { id =>
      val f0 = (id % 50 + 10).toInt
      val f1 = f0 / 2 // 8000 → 4000
      val expSum = (0 until f1).map(j =>
        ((id * 31 + (2L * j) * 7) % 2003 - 1001)).sum
      stats(id) shouldBe ((4000, f1, expSum))
    }
    // meta comes from the decode, not the (deliberately wrong) input meta
    val m = out.select("meta.format", "meta.duration_ms").limit(1).collect()(0)
    m.getString(0) shouldBe "wav"
    // the stub path still covers undecodable audio payloads
    val fake = Media.synthetic(spark, 6).filter($"kind" === "audio")
    Media.resampleAudio(fake, 4000).count() shouldBe fake.count()
  }

  test("extractFeatures takes the REAL audio path: RMS windows over frames") {
    val media = Media.syntheticRealWav(spark, 8)
    val feats = Media.extractFeatures(media, dim = 4).collect()
    feats.length shouldBe 8
    feats.foreach { f =>
      f.feature.length shouldBe 4
      // real waveform RMS: positive, bounded by full scale
      all(f.feature.map(_.toDouble)) should (be >= 0.0 and be <= 1.0)
      f.feature.exists(_ > 0f) shouldBe true
    }
  }

  test("Jpeg codec: dims exact, solid-color pixels within tolerance") {
    val img = Ppm.Image(24, 16, {
      val a = new Array[Byte](24 * 16 * 3)
      var i = 0
      while (i < a.length) { a(i) = (Seq(80, 140, 200)(i % 3)).toByte; i += 1 }
      a
    })
    val bytes = Jpeg.encode(img)
    Jpeg.looksLikeJpeg(bytes) shouldBe true
    val back = Jpeg.decode(bytes).get
    back.width shouldBe 24
    back.height shouldBe 16
    // lossy codec: every channel within a few code values of the original
    back.rgb.indices.foreach { i =>
      math.abs((back.rgb(i) & 0xff) - (img.rgb(i) & 0xff)) should be <= 8
    }
    // signature dispatch: non-JPEG payloads are rejected in O(2 bytes)
    Jpeg.decode("not a jpeg".getBytes) shouldBe None
    Jpeg.decode(Array[Byte](0xff.toByte, 0xd8.toByte)) shouldBe None
    Media.decodeImage(bytes).map(_._2) shouldBe Some("jpeg")
  }

  test("resizeImages takes the REAL path for JPEG payloads, container-preserving") {
    val media = Media.syntheticRealJpeg(spark, 60L)
    val resized = Media.resizeImages(media, maxW = 8, maxH = 8)
    val rows = resized.as[Media.MediaRow].collect()
    rows.length shouldBe 60
    rows.foreach { r =>
      val id = r.media_id
      val w0 = (id % 23 + 3).toInt
      val h0 = (id % 17 + 3).toInt
      val scale = math.min(1.0, math.min(8.0 / w0, 8.0 / h0))
      val nw = math.max(1, (w0 * scale).toInt)
      val nh = math.max(1, (h0 * scale).toInt)
      // meta must come from the DECODE, not the (deliberately wrong) input
      r.meta.width shouldBe Some(nw)
      r.meta.height shouldBe Some(nh)
      r.meta.format shouldBe Some("jpeg") // container-preserving re-encode
      val dec = Jpeg.decode(r.payload).get
      dec.width shouldBe nw
      dec.height shouldBe nh
      // solid color survives decode→nearest-resample→re-encode within
      // a per-channel tolerance (two lossy hops)
      val exp = Array((id % 200 + 20).toInt, (id * 7 % 200 + 20).toInt,
        (id * 13 % 200 + 20).toInt)
      dec.rgb.indices.foreach { i =>
        math.abs((dec.rgb(i) & 0xff) - exp(i % 3)) should be <= 16
      }
    }
  }

  test("fft matches a naive DFT on a random signal (and Parseval holds)") {
    val n = 64
    val rnd = new scala.util.Random(7)
    val sig = Array.fill(n)(rnd.nextDouble() * 2 - 1)
    val re = sig.clone(); val im = new Array[Double](n)
    Wav.fft(re, im)
    // naive O(n^2) DFT as the independent reference
    (0 until n).foreach { k =>
      var sr = 0.0; var si = 0.0
      (0 until n).foreach { t =>
        val a = -2.0 * math.Pi * k * t / n
        sr += sig(t) * math.cos(a); si += sig(t) * math.sin(a)
      }
      re(k) shouldBe sr +- 1e-9
      im(k) shouldBe si +- 1e-9
    }
    // Parseval: sum|x|^2 = (1/n) sum|X|^2
    val t2 = sig.map(v => v * v).sum
    val f2 = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum / n
    f2 shouldBe t2 +- 1e-9
  }

  test("spectralFeatures pins an exact-bin pure tone to its frequency") {
    val rate = 8000; val frame = 512
    val binHz = rate.toDouble / frame // 15.625
    val b = 24 // 375 Hz, integer cycles per frame => single-bin peak
    val samples = Array.tabulate(frame * 4)(i =>
      (12000.0 * StrictMath.sin(2.0 * StrictMath.PI * b * i / frame)).toShort)
    val f = Wav.spectralFeatures(Wav.Audio(rate, 1, samples), frame)
    f.windows shouldBe 4
    f.dominantHz shouldBe b * binHz +- 1e-9
    // quantization spreads negligible energy; centroid hugs the tone bin
    f.centroidHz shouldBe (b * binHz) +- 1.0
  }

  test("audioSpectral: real decode -> FFT across the frame; stubs map to -1") {
    val rate = 8000; val frame = 512
    val rows = (0L until 6L).map { id =>
      val b = 16 * (1 + (id % 3)).toInt // bins 16/32/48 -> 250/500/750 Hz
      val samples = Array.tabulate(frame * 2)(i =>
        (9000.0 * StrictMath.sin(2.0 * StrictMath.PI * b * i / frame)).toShort)
      Media.MediaRow(id, "audio", Wav.encode(Wav.Audio(rate, 1, samples)),
        Media.MediaMeta(None, None, Some("wav"), None))
    } :+ Media.MediaRow(99L, "audio", Array[Byte](1, 2, 3),
      Media.MediaMeta(None, None, Some("mp4"), None))
    import spark.implicits._
    val out = Media.audioSpectral(rows.toDF(), frame)
      .select("media_id", "sample_rate", "n_windows", "dominant_hz")
      .as[(Long, Int, Int, Double)].collect().sortBy(_._1)
    out.take(6).foreach { case (id, sr, w, hz) =>
      sr shouldBe rate
      w shouldBe 2
      hz shouldBe 250.0 * (1 + (id % 3)) +- 1e-9
    }
    out.last shouldBe ((99L, -1, -1, -1.0))
  }
}
