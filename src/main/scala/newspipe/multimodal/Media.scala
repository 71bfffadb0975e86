package newspipe.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (extension track, SURVEY.md §7).
  *
  * Design: image/audio/video payloads are opaque `binary` columns with a
  * typed metadata struct, so the 100 TB pipeline can shuffle/filter/join on
  * metadata without touching bytes, and only the per-partition kernel ever
  * decodes. The Spark-side plumbing — schema, encoders, partition-wise batch
  * processing, feature extraction shape — is real and tested. Decode is
  * REAL for uncompressed 8-bit P6 PPM payloads ([[Ppm]]), baseline 8-bit
  * PNG ([[Png]] — pure JVM, zlib via `java.util.zip`) AND JPEG ([[Jpeg]] —
  * the JDK's own `javax.imageio`, headless, no extra dependency): genuine
  * parse → pixel transform → re-encode in [[resizeImages]]
  * (container-preserving: png in → png out, jpeg in → jpeg out) and a real
  * spatial luminance feature in [[extractFeatures]]. AUDIO is real too:
  * WAV PCM decodes through the JDK's own `javax.sound.sampled` ([[Wav]] —
  * headless, no extra dependency), with genuine resample / RMS-window
  * kernels in [[resampleAudio]]/[[extractFeatures]]. Only mp4 video still
  * falls back to the DETERMINISTIC STUBS marked `// STUB:` at each site
  * (the JDK ships no video codec); swapping in a real codec is a
  * one-function change per kernel, exactly the Ppm/Png/Jpeg/Wav shape.
  */
object Media {

  /** media(media_id, kind, payload binary, meta struct) — the lake schema. */
  val schema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),      // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("format", StringType),
      StructField("duration_ms", LongType))))))

  final case class MediaMeta(width: Option[Int], height: Option[Int],
      format: Option[String], duration_ms: Option[Long])
  final case class MediaRow(media_id: Long, kind: String,
      payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String,
      feature: Array[Float], n_bytes: Long)

  /** Deterministic synthetic media table for tests/bench: payload bytes are
    * a seeded function of media_id (stands in for real blobs; sizes vary so
    * batch-shape handling is exercised).
    */
  def synthetic(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("id") % 3 + 1).cast("int")).as("kind"),
      // payload: sha2 hex of the id, repeated — deterministic, 64-512 bytes
      encode(repeat(sha2(col("id").cast("string"), 256),
        (col("id") % 8 + 1).cast("int")), "utf-8").as("payload"),
      struct(
        (col("id") % 640 + 64).cast("int").as("width"),
        (col("id") % 480 + 48).cast("int").as("height"),
        element_at(array(lit("png"), lit("wav"), lit("mp4")),
          (col("id") % 3 + 1).cast("int")).as("format"),
        (col("id") % 60000).as("duration_ms")).as("meta"))

  /** Deterministic media table with REAL decodable payloads: solid-color
    * images, even ids as binary P6 PPM, odd ids as baseline RGB PNG.
    * Dims `(id % 23 + 3) × (id % 17 + 3)`, color channels
    * `(id%200+20, id*7%200+20, id*13%200+20)` — all closed-form, so an
    * external oracle can predict decoded dims and pixel sums without
    * running either codec. The meta struct is DELIBERATELY wrong (9999×9999
    * "jpeg"): any correct output meta must come from an actual decode.
    */
  def syntheticReal(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = (id % 23 + 3).toInt
        val h = (id % 17 + 3).toInt
        val rgbv = Array(((id % 200) + 20).toByte,
          ((id * 7 % 200) + 20).toByte, ((id * 13 % 200) + 20).toByte)
        val rgb = new Array[Byte](w * h * 3)
        var i = 0
        while (i < rgb.length) { rgb(i) = rgbv(i % 3); i += 1 }
        val img = Ppm.Image(w, h, rgb)
        val payload = if (id % 2 == 0) Ppm.encode(img) else Png.encode(img)
        MediaRow(id, "image", payload,
          MediaMeta(Some(9999), Some(9999), Some("jpeg"), None))
      }
    }.toDF()
  }

  /** Decode-derived per-image checksum: (media_id, dec_w, dec_h, pix_sum)
    * where pix_sum is the unsigned sum of all RGB bytes (-1/-1/-1 when the
    * payload doesn't decode) — the round-trip witness for the real codecs.
    */
  def imagePixelSums(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        decodeImage(if (r.payload == null) Array.empty[Byte] else r.payload) match {
          case Some((img, _)) =>
            var s = 0L
            var i = 0
            while (i < img.rgb.length) { s += img.rgb(i) & 0xff; i += 1 }
            (r.media_id, img.width, img.height, s)
          case None => (r.media_id, -1, -1, -1L)
        }
      }
    }.toDF("media_id", "dec_w", "dec_h", "pix_sum")
  }

  /** Try the real codecs in signature order; returns the image plus its
    * source container ("ppm" | "png" | "jpeg"). None → caller's stub path.
    */
  def decodeImage(bytes: Array[Byte]): Option[(Ppm.Image, String)] =
    Ppm.decode(bytes).map((_, "ppm"))
      .orElse(Png.decode(bytes).map((_, "png")))
      .orElse(Jpeg.decode(bytes).map((_, "jpeg")))

  private def encodeImage(img: Ppm.Image, container: String): Array[Byte] =
    container match {
      case "png" => Png.encode(img)
      case "jpeg" => Jpeg.encode(img)
      case _ => Ppm.encode(img)
    }

  /** [[syntheticReal]]'s JPEG sibling: the same closed-form solid-color
    * dims/channels, encoded as baseline JPEG ([[Jpeg.encode]]). Because
    * JPEG is lossy, the external oracle predicts decoded DIMENSIONS exactly
    * but pixel sums only within a per-channel tolerance — the q131 contract
    * shape. Meta is the same deliberately-wrong 9999×9999 "png".
    */
  def syntheticRealJpeg(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = (id % 23 + 3).toInt
        val h = (id % 17 + 3).toInt
        val rgbv = Array(((id % 200) + 20).toByte,
          ((id * 7 % 200) + 20).toByte, ((id * 13 % 200) + 20).toByte)
        val rgb = new Array[Byte](w * h * 3)
        var i = 0
        while (i < rgb.length) { rgb(i) = rgbv(i % 3); i += 1 }
        MediaRow(id, "image", Jpeg.encode(Ppm.Image(w, h, rgb)),
          MediaMeta(Some(9999), Some(9999), Some("png"), None))
      }
    }.toDF()
  }

  /** [[syntheticReal]]'s AUDIO sibling: mono 16-bit PCM WAV payloads with
    * closed-form samples — `frames = id % 50 + 10`, rate 8000 Hz, sample
    * `j` = `(id * 31 + j * 7) % 2003 - 1001` — so an external oracle can
    * predict resampled frame counts and sample sums without running the
    * codec (16-bit PCM is lossless through encode/decode). Meta is the
    * DELIBERATELY wrong image shape: correct output metadata must come
    * from an actual decode.
    */
  def syntheticRealWav(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val frames = (id % 50 + 10).toInt
        val samples = Array.tabulate(frames)(j =>
          ((id * 31 + j.toLong * 7) % 2003 - 1001).toShort)
        MediaRow(id, "audio", Wav.encode(Wav.Audio(8000, 1, samples)),
          MediaMeta(Some(9999), Some(9999), Some("png"), None))
      }
    }.toDF()
  }

  /** Decode-verified stats of an AUDIO frame — the audio sibling of the
    * image `decodedStats`: everything from the actual [[Wav]] decode,
    * `(-1, …)` for payloads the codec rejects.
    */
  def audioStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        Wav.decode(if (r.payload == null) Array.empty[Byte] else r.payload)
          match {
            case Some(a) =>
              var s = 0L
              var i = 0
              while (i < a.samples.length) { s += a.samples(i); i += 1 }
              (r.media_id, a.sampleRate, a.channels, a.frames, s,
                a.durationMs)
            case None => (r.media_id, -1, -1, -1, -1L, -1L)
          }
      }
    }.toDF("media_id", "sample_rate", "channels", "n_frames",
      "sample_sum", "duration_ms")
  }

  /** Spectral analysis of AUDIO frames — a REAL frequency-domain kernel
    * over the decoded waveform ([[Wav.spectralFeatures]]: radix-2 FFT,
    * mean power spectrum over non-overlapping `frame`-sample windows,
    * dominant-bin and centroid frequencies in Hz). `(-1, …)` rows mark
    * payloads the codec rejects; audio shorter than one analysis window
    * reports zero windows. Partition-wise mapPartitions like every
    * opaque-binary kernel — embarrassingly parallel, no shuffle.
    */
  def audioSpectral(media: DataFrame, frame: Int = 512): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "audio").as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        Wav.decode(if (r.payload == null) Array.empty[Byte] else r.payload)
          match {
            case Some(a) =>
              val f = Wav.spectralFeatures(a, frame)
              (r.media_id, a.sampleRate, f.windows, f.dominantHz,
                f.centroidHz)
            case None => (r.media_id, -1, -1, -1.0, -1.0)
          }
      }
    }.toDF("media_id", "sample_rate", "n_windows", "dominant_hz",
      "centroid_hz")
  }

  /** Audio resample: WAV payloads take the REAL path — decode,
    * nearest-frame resample ([[Wav.resample]]'s closed-form integer
    * math), re-encode as WAV, metadata duration from the DECODED truth.
    * Non-WAV audio (mp4 containers) keeps the documented stub: payload
    * truncated by the rate ratio so size accounting behaves.
    */
  def resampleAudio(media: DataFrame, targetRate: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "audio").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          if (r.payload == null) r
          else Wav.decode(r.payload) match {
            case Some(a) =>
              val out = Wav.resample(a, targetRate)
              r.copy(payload = Wav.encode(out),
                meta = r.meta.copy(width = None, height = None,
                  format = Some("wav"),
                  duration_ms = Some(out.durationMs)))
            case None =>
              // STUB: real kernel = demux → resample → remux. Fake keeps
              // a rate-proportional prefix of the payload, assuming the
              // CD-standard 44.1 kHz source rate for non-WAV containers
              // (their headers aren't parsed here).
              val assumedSourceRate = 44100.0
              val ratio = math.min(1.0, targetRate / assumedSourceRate)
              val keep = math.max(1, (r.payload.length * ratio).toInt)
              r.copy(payload = r.payload.take(keep))
          }
        }
      }.toDF()
  }

  /** Per-partition feature extraction: decode → fixed-size float vector.
    * The partition iterator IS the batch boundary (mirrors mapInPandas
    * batch semantics): rows stream through without materializing the
    * partition, and the kernel amortizes any per-batch setup across the
    * partition.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition setup would go here (codec init, model load)
      rows.map { r =>
        val bytes = if (r.payload == null) Array.empty[Byte] else r.payload
        val feat = decodeImage(bytes)
          // REAL image path: decoded image → per-band mean luminance
          .map { case (img, _) => Ppm.bandLuminance(img, dim) }
          // REAL audio path: decoded waveform → per-window RMS (temporal)
          .orElse(Wav.decode(bytes).map(Wav.rmsWindows(_, dim)))
          .getOrElse {
            // STUB: real kernel = decode(bytes) → model features.
            // Deterministic fake: k-strided byte histogram, normalized.
            val f = new Array[Float](dim)
            var i = 0
            while (i < bytes.length) { f(i % dim) += (bytes(i) & 0xff) / 255.0f; i += 1 }
            val norm = math.sqrt(f.map(x => x * x).sum).toFloat
            if (norm == 0f) f else f.map(_ / norm)
          }
        MediaFeatures(r.media_id, r.kind, feat, bytes.length.toLong)
      }
    }
  }

  /** Image resize: aspect-preserving downscale to fit (maxW, maxH); never
    * upscales. P6 PPM and baseline PNG payloads take the REAL path — decode,
    * nearest-neighbor resample, re-encode in the SAME container, metadata
    * from the DECODED dimensions (the payload is the truth, not the meta
    * struct — including on the no-op branch, so wrong input meta never
    * survives a real decode). Other formats take the documented stub.
    */
  def resizeImages(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val resized = media.filter(col("kind") === "image").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          if (r.payload == null) r // nothing to resize; row passes through
          else decodeImage(r.payload) match {
            case Some((img, container)) =>
              val scale = math.min(1.0, math.min(
                maxW.toDouble / img.width, maxH.toDouble / img.height))
              val nw = math.max(1, (img.width * scale).toInt)
              val nh = math.max(1, (img.height * scale).toInt)
              if (nw == img.width && nh == img.height)
                // no-op resize: payload byte-identical, but meta still comes
                // from the DECODED truth (drops any wrong upstream dims)
                r.copy(meta = r.meta.copy(width = Some(img.width),
                  height = Some(img.height), format = Some(container)))
              else r.copy(payload = encodeImage(Ppm.resizeNearest(img, nw, nh), container),
                meta = r.meta.copy(width = Some(nw), height = Some(nh),
                  format = Some(container)))
            case None =>
              val w = r.meta.width.getOrElse(0)
              val h = r.meta.height.getOrElse(0)
              val scale = math.min(1.0, math.min(maxW.toDouble / math.max(w, 1),
                maxH.toDouble / math.max(h, 1)))
              val nw = math.max(1, (w * scale).toInt)
              val nh = math.max(1, (h * scale).toInt)
              // STUB: real kernel = decode → scale → re-encode. Fake keeps
              // the payload, truncated proportionally to the area ratio, so
              // downstream size accounting behaves like a real resize.
              val keep = math.max(1, (r.payload.length * scale * scale).toInt)
              r.copy(payload = r.payload.take(keep),
                meta = r.meta.copy(width = Some(nw), height = Some(nh)))
          }
        }
      }
    resized.toDF()
  }

  /** Video frame sampling plumbing: one output row per sampled frame,
    * `frame_idx` stamped — the explode-shaped kernel (1 row → N rows).
    */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L,
      maxFrames: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video").as[MediaRow]
      .flatMap { r =>
        if (r.payload == null || r.payload.isEmpty) Nil // nothing to sample
        else {
          val dur = r.meta.duration_ms.getOrElse(0L)
          val n = math.min(maxFrames.toLong,
            math.max(1L, dur / math.max(everyMs, 1L))).toInt
          (0 until n).map { i =>
            // STUB: real kernel = seek+decode frame i. Fake: slice of payload.
            val sliceLen = math.max(1, r.payload.length / n)
            (r.media_id, i, r.payload.slice(i * sliceLen, (i + 1) * sliceLen))
          }
        }
      }
      .toDF("media_id", "frame_idx", "frame_payload")
  }
}
