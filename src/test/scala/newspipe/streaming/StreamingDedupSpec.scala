package newspipe.streaming

import newspipe.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** §7 extension: streaming exact dedup — cross-batch suppression with
  * watermark-bounded state.
  */
class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("a duplicate arriving in a later micro-batch is suppressed") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val q = StreamingDedup.exact(stream.toDF().toDF("ts", "text"),
        Seq("text"), "ts", watermark = "1 hour")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      stream.addData((ts("2026-01-01 10:00:00"), "doc a"),
        (ts("2026-01-01 10:05:00"), "doc b"))
      q.processAllAvailable()
      // batch 2: "doc a" again (within the watermark) + a new doc
      stream.addData((ts("2026-01-01 10:10:00"), "doc a"),
        (ts("2026-01-01 10:15:00"), "doc c"))
      q.processAllAvailable()
      val texts = spark.table("sdedup").select("text").as[String].collect().sorted
      texts shouldBe Array("doc a", "doc b", "doc c") // second "doc a" dropped
    } finally q.stop()
  }

  test("state expires past the watermark: a far-later duplicate is re-admitted") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val q = StreamingDedup.exact(stream.toDF().toDF("ts", "text"),
        Seq("text"), "ts", watermark = "10 minutes")
      .writeStream.format("memory").queryName("sdedup_exp")
      .outputMode("append").start()
    try {
      stream.addData((ts("2026-01-01 10:00:00"), "doc a"))
      q.processAllAvailable()
      // advance the watermark far beyond 10:00 + 10min, expiring the digest
      stream.addData((ts("2026-01-01 12:00:00"), "other"))
      q.processAllAvailable()
      stream.addData((ts("2026-01-01 12:01:00"), "doc a")) // state expired
      q.processAllAvailable()
      spark.table("sdedup_exp").filter($"text" === "doc a").count() shouldBe 2
    } finally q.stop()
  }

  test("within one horizon the stream keeps the same digests as the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (ts("2026-01-01 10:00:00"), "x"), (ts("2026-01-01 10:01:00"), "y"),
      (ts("2026-01-01 10:02:00"), "x"), (ts("2026-01-01 10:03:00"), "z"),
      (ts("2026-01-01 10:04:00"), "y"))
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    stream.addData(rows: _*)
    val q = StreamingDedup.exact(stream.toDF().toDF("ts", "text"),
        Seq("text"), "ts").writeStream.format("memory")
      .queryName("sdedup_par").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sdedup_par").select("text").as[String].collect().sorted
    val batch = newspipe.ops.Dedup
      .exact(rows.toDF("ts", "text").withColumn("id",
        org.apache.spark.sql.functions.monotonically_increasing_id()),
        "id", Seq("text"))
      .select("text").as[String].collect().sorted
    streamed shouldBe batch
  }

  private val baseText = "the quick brown fox jumps over the lazy dog and runs far away into the deep green forest tonight"

  test("nearBySignature suppresses a signature-identical later arrival, keeps distinct docs") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val q = StreamingDedup.nearBySignature(stream.toDF().toDF("ts", "text"),
        "text", "ts", watermark = "1 hour")
      .writeStream.format("memory").queryName("snear")
      .outputMode("append").start()
    try {
      stream.addData((ts("2026-01-01 10:00:00"), baseText),
        (ts("2026-01-01 10:01:00"), "completely different text about engines"))
      q.processAllAvailable()
      // identical content (signature-equal) in a later batch → suppressed;
      // punctuation/case changes that tokenize identically also collapse
      stream.addData((ts("2026-01-01 10:10:00"), baseText),
        (ts("2026-01-01 10:11:00"), baseText.toUpperCase + "!!!"),
        (ts("2026-01-01 10:12:00"), "a third, genuinely new document body"))
      q.processAllAvailable()
      val texts = spark.table("snear").select("text").as[String].collect()
      texts.length shouldBe 3
      texts.count(_.toLowerCase.startsWith("the quick")) shouldBe 1
    } finally q.stop()
  }

  test("nearBySignature: tokenless rows pass through instead of collapsing onto one state key") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val q = StreamingDedup.nearBySignature(stream.toDF().toDF("ts", "text"),
        "text", "ts", watermark = "1 hour")
      .writeStream.format("memory").queryName("snear_null")
      .outputMode("append").start()
    try {
      stream.addData((ts("2026-01-01 10:00:00"), null.asInstanceOf[String]),
        (ts("2026-01-01 10:01:00"), ""),
        (ts("2026-01-01 10:02:00"), "###"), // tokenizes to nothing
        (ts("2026-01-01 10:03:00"), "real content document here"))
      q.processAllAvailable()
      spark.table("snear_null").count() shouldBe 4 // nothing spuriously merged
    } finally q.stop()
  }
}
