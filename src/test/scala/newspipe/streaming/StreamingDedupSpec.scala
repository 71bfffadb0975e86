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

  // ---- nearBanded: band-level streaming near-dedup --------------------------

  // six distinct base docs with disjoint vocabularies, so only the PLANTED
  // near-dup pairs band together
  private val bases = Seq(
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar papa",
    "quebec romeo sierra tango uniform victor whiskey xray yankee zulu amber bronze copper diamond emerald flint",
    "gamma helium iodine krypton lithium mercury neon oxygen platinum radon silicon titanium uranium xenon zinc argon",
    "apple banana cherry date elderberry fig grape honeydew kiwi lemon mango nectarine orange papaya quince raspberry",
    "anchor beacon cabin dynamo engine flagpole gear harbor island jetty keel lantern mast nautical oar port",
    "acorn birch cedar dogwood elm fir ginkgo hawthorn ironwood juniper koa larch maple nutmeg oak pine")

  test("nearBanded: cross-batch suppression parity with batch minhashCandidates") {
    implicit val sqlCtx = spark.sqlContext
    // batch 1: docs 0-5 (the six bases). batch 2: docs 6-8 = one-word edits
    // of bases 0-2 (shingle Jaccard ≈ 0.8 — NOT signature-identical), doc 9
    // = a fresh base, doc 10 = an exact copy of base 3.
    val b1 = bases.zipWithIndex.map { case (t, i) =>
      (i.toLong, ts(s"2026-01-01 10:0$i:00"), t) }
    // doc 11 near-dups doc 9 — BOTH arrive in batch 2, so the within-batch
    // greedy path (first-in-bucket wins) is exercised alongside cross-batch
    val b2 = Seq(
      (6L, ts("2026-01-01 10:10:00"), bases(0).replace("kilo", "kappa")),
      (7L, ts("2026-01-01 10:11:00"), bases(1).replace("amber", "auburn")),
      (8L, ts("2026-01-01 10:12:00"), bases(2).replace("neon", "nitrogen")),
      (9L, ts("2026-01-01 10:13:00"), bases(5).split(" ").reverse.mkString(" ")),
      (10L, ts("2026-01-01 10:14:00"), bases(3)),
      (11L, ts("2026-01-01 10:15:00"),
        bases(5).split(" ").reverse.mkString(" ").replace("acorn", "almond")))
    val all = (b1 ++ b2).toDF("id", "ts", "text")

    // the batch operator's verdict over the SAME corpus: a doc is suppressed
    // iff it is the LATER side of any candidate pair (ids follow arrival
    // order, and minhashCandidates emits id_a < id_b)
    val suppressed = newspipe.ops.Dedup
      .minhashCandidates(all, "id", "text")
      .select("id_b").as[Long].collect().toSet
    val expectedKept = (0L to 11L).toSet -- suppressed
    // the test only bites if banding actually pairs the planted edits but
    // not the unrelated docs — cross-batch (6,7,10) AND within-batch (11)
    suppressed should contain allOf (6L, 7L, 10L, 11L)
    suppressed should not contain 9L

    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamingDedup.nearBanded(stream.toDF().toDF("id", "ts", "text"),
        "id", "text", "ts", watermark = "1 hour")
      .writeStream.format("memory").queryName("snb_parity")
      .outputMode("append").start()
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
      val kept = spark.table("snb_parity").select("id").as[Long].collect().toSet
      kept shouldBe expectedKept
    } finally q.stop()
  }

  test("nearBanded: suppressed docs still claim buckets (chain parity) and state expires by watermark") {
    implicit val sqlCtx = spark.sqlContext
    val a = bases(0)
    val b = bases(0).replace("kilo", "kappa")   // ~0.8 vs a
    val c = bases(0).replace("kilo", "kappa").replace("papa", "peter") // near b
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamingDedup.nearBanded(stream.toDF().toDF("id", "ts", "text"),
        "id", "text", "ts", watermark = "10 minutes")
      .writeStream.format("memory").queryName("snb_chain")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts("2026-01-01 10:00:00"), a))
      q.processAllAvailable()
      stream.addData((2L, ts("2026-01-01 10:01:00"), b)) // suppressed by a
      q.processAllAvailable()
      stream.addData((3L, ts("2026-01-01 10:02:00"), c)) // suppressed via b's claim
      q.processAllAvailable()
      // advance the watermark far past every claim, expiring all state
      stream.addData((4L, ts("2026-01-01 12:00:00"), bases(4)))
      q.processAllAvailable()
      stream.addData((5L, ts("2026-01-01 12:01:00"), a)) // re-admitted
      q.processAllAvailable()
      val kept = spark.table("snb_chain").select("id").as[Long].collect().toSet
      kept shouldBe Set(1L, 4L, 5L)
    } finally q.stop()
  }

  test("nearBanded: state rows are bounded by bands x docs (one claim per bucket, no payload)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamingDedup.nearBanded(stream.toDF().toDF("id", "ts", "text"),
        "id", "text", "ts", watermark = "1 hour", numHashes = 64, bands = 16)
      .writeStream.format("memory").queryName("snb_state")
      .outputMode("append").start()
    try {
      stream.addData(bases.zipWithIndex.map { case (t, i) =>
        (i.toLong, ts(s"2026-01-01 10:0$i:00"), t) }: _*)
      q.processAllAvailable()
      val state = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      // 6 distinct docs x 16 bands = at most 96 claimed buckets; the skew
      // guarantee: hot buckets do not multiply state (one row per bucket)
      state should be > 0L
      state should be <= (6L * 16L)
    } finally q.stop()
  }

  test("nearBanded: same-batch at-least-once redelivery keeps exactly one copy") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamingDedup.nearBanded(stream.toDF().toDF("id", "ts", "text"),
        "id", "text", "ts", watermark = "1 hour")
      .writeStream.format("memory").queryName("snb_replay")
      .outputMode("append").start()
    try {
      // id 1 delivered twice in ONE micro-batch (source replay): the doc
      // must survive once — not be dropped as its own duplicate
      stream.addData(
        (1L, ts("2026-01-01 10:00:00"), bases(0)),
        (1L, ts("2026-01-01 10:00:00"), bases(0)),
        (2L, ts("2026-01-01 10:01:00"), bases(1)))
      q.processAllAvailable()
      spark.table("snb_replay").select("id").as[Long].collect().sorted shouldBe
        Array(1L, 2L)
    } finally q.stop()
  }

  test("nearBanded: same-id deliveries with DIFFERENT texts never pool fresh bands") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamingDedup.nearBanded(stream.toDF().toDF("id", "ts", "text"),
        "id", "text", "ts", watermark = "1 hour")
      .writeStream.format("memory").queryName("snb_variants")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts("2026-01-01 10:00:00"), bases(0)))
      q.processAllAvailable()
      // id 99 delivered TWICE with different texts in one batch: variant A
      // is an exact copy of doc 1 (all bands cross-batch-stale, 0 fresh),
      // variant B is brand-new (all bands fresh). Pooling the counts
      // (old bug) reaches bands and could emit the DUP payload; per-
      // delivery judgment keeps exactly B and drops A.
      stream.addData(
        (99L, ts("2026-01-01 10:10:00"), bases(0)),
        (99L, ts("2026-01-01 10:10:00"), bases(1)))
      q.processAllAvailable()
      val out = spark.table("snb_variants").as[(Long, java.sql.Timestamp, String)]
        .collect().filter(_._1 == 99L)
      out.length shouldBe 1
      out.head._3 shouldBe bases(1) // the clean variant, deterministically
    } finally q.stop()
  }

  test("nearBanded with verifyThreshold: within-batch precision matches batch minhashDedup") {
    implicit val sqlCtx = spark.sqlContext
    // Mixed-Jaccard single-batch corpus: six disjoint bases, plus
    //  20 = one-word edit of bases(0)   → shingle J ≈ 11/17 ≈ 0.65  (SPURIOUS
    //       band collision at threshold 0.8 — banding pairs it, verify must keep)
    //  21 = exact copy of bases(1)      → J = 1.0   (verified dup, dropped)
    //  22 = one-word edit of a 96-word doc → J = 91/97 ≈ 0.94 (verified dup)
    val longDoc = bases.mkString(" ")
    val corpus = Seq(
      (0L, bases(0)), (1L, bases(1)), (2L, bases(2)), (3L, bases(3)),
      (4L, bases(4)), (5L, bases(5)), (6L, longDoc),
      (20L, bases(0).replace("kilo", "kappa")),
      (21L, bases(1)),
      (22L, longDoc.replace("mercury", "cobalt")))
    val df = corpus.toDF("id", "text")

    // the batch pipeline's verdict at the same threshold: minhashDedup keeps
    // the verified-unique set (greedy by min id)
    val batchKept = newspipe.ops.Dedup
      .minhashDedup(df, "id", "text", threshold = 0.8)
      .select("id").as[Long].collect().toSet
    // sanity: the spurious pair banded but failed exact-Jaccard verify
    batchKept should contain (20L)
    batchKept should not contain 21L
    batchKept should not contain 22L
    val bandedPairs = newspipe.ops.Dedup.minhashCandidates(df, "id", "text")
      .select("id_b").as[Long].collect().toSet
    bandedPairs should contain (20L) // the collision the verify must overrule

    val rows = corpus.zipWithIndex.map { case ((id, t), i) =>
      (id, ts(f"2026-01-01 10:${i}%02d:00"), t) }
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamingDedup.nearBanded(stream.toDF().toDF("id", "ts", "text"),
        "id", "text", "ts", watermark = "1 hour",
        verifyThreshold = Some(0.8))
      .writeStream.format("memory").queryName("snb_verify")
      .outputMode("append").start()
    try {
      stream.addData(rows: _*) // ONE micro-batch: every pair is within-batch
      q.processAllAvailable()
      val kept = spark.table("snb_verify").select("id").as[Long].collect().toSet
      kept shouldBe batchKept
    } finally q.stop()
  }

  test("nearBanded: tokenless/null-id rows pass through; distinct docs in one batch all survive") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Option[Long], java.sql.Timestamp, String)]
    val q = StreamingDedup.nearBanded(stream.toDF().toDF("id", "ts", "text"),
        "id", "text", "ts", watermark = "1 hour")
      .writeStream.format("memory").queryName("snb_null")
      .outputMode("append").start()
    try {
      stream.addData(
        (Some(1L), ts("2026-01-01 10:00:00"), null.asInstanceOf[String]),
        (Some(2L), ts("2026-01-01 10:01:00"), ""),
        (Some(3L), ts("2026-01-01 10:02:00"), "###"),
        (Some(4L), ts("2026-01-01 10:03:00"), bases(0)),
        (Some(5L), ts("2026-01-01 10:04:00"), bases(1)),
        // null id: cannot key state — passes through instead of NPE/merge
        (None, ts("2026-01-01 10:05:00"), bases(2)))
      q.processAllAvailable()
      spark.table("snb_null").count() shouldBe 6
      spark.table("snb_null").select("id").as[Option[Long]].collect().flatten
        .toSet shouldBe Set(1L, 2L, 3L, 4L, 5L)
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
