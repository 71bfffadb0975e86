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
