package newspipe.ops

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** §7 extension: BPE tokenizer training — merge-table correctness against
  * the Sennrich worked example, determinism, encode semantics, and the
  * distributed-count / local-train split.
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // the classic Sennrich et al. fixture: vocab {low:5, lower:2, newest:6,
  // widest:3}
  private val sennrich: Array[(Array[String], Long)] = Array(
    ("low".map(_.toString).toArray :+ Bpe.EndOfWord, 5L),
    ("lower".map(_.toString).toArray :+ Bpe.EndOfWord, 2L),
    ("newest".map(_.toString).toArray :+ Bpe.EndOfWord, 6L),
    ("widest".map(_.toString).toArray :+ Bpe.EndOfWord, 3L))

  test("trainLocal reproduces the Sennrich worked example's first merges") {
    val merges = Bpe.trainLocal(sennrich, numMerges = 4)
    // ('e','s') at 9 (newest 6 + widest 3) is the unambiguous first merge,
    // then ('es','t') at 9, then ('est','</w>') at 9
    merges(0).left shouldBe "e"; merges(0).right shouldBe "s"
    merges(1).left shouldBe "es"; merges(1).right shouldBe "t"
    merges(2).left shouldBe "est"; merges(2).right shouldBe Bpe.EndOfWord
    merges.map(_.rank) shouldBe Seq(0, 1, 2, 3)
  }

  test("ties break lexicographically — the merge table is a total function of the vocab") {
    // two pairs with equal weight: ('a','b') and ('c','d') both count 1
    val vocab = Array(
      (Array("a", "b", Bpe.EndOfWord), 1L),
      (Array("c", "d", Bpe.EndOfWord), 1L))
    val merges = Bpe.trainLocal(vocab, 1)
    merges.head.left shouldBe "a" // lexicographic winner, not input order
    Bpe.trainLocal(vocab.reverse, 1) shouldBe merges
  }

  test("training stops when no pairs remain, shorter than requested") {
    val merges = Bpe.trainLocal(Array((Array("a", Bpe.EndOfWord), 3L)), 10)
    merges.length shouldBe 1 // only ('a','</w>') exists, then nothing
  }

  test("encodeWord applies merges by RANK priority, not position") {
    val merges = Bpe.trainLocal(sennrich, 3)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    // 'newest' collapses its suffix through e+s → es+t → est+</w>
    Bpe.encodeWord("newest", ranks) shouldBe Seq("n", "e", "w", "est</w>")
    // unseen word falls back to characters + marker
    Bpe.encodeWord("zzz", ranks) shouldBe Seq("z", "z", "z", Bpe.EndOfWord)
  }

  test("end-to-end: distributed counts → train → encode column, deterministic") {
    val corpus = Seq.tabulate(30)(i =>
      (i.toLong, if (i % 2 == 0) "newest newest widest" else "low lower"))
      .toDF("id", "text")
    val wc = Bpe.wordCounts(corpus, "text")
    wc.as[(String, Long)].collect().toMap.apply("newest") shouldBe 30L
    val merges = Bpe.train(wc, numMerges = 5)
    merges.length shouldBe 5
    // the same corpus repartitioned trains the identical table
    Bpe.train(Bpe.wordCounts(corpus.repartition(7), "text"), 5) shouldBe merges
    val enc = Bpe.encode(merges)
    val counts = corpus.select(col("id"),
        Bpe.tokenCount(merges)(col("text")).as("n"))
      .as[(Long, Int)].collect().toMap
    counts(0) should be > 0
    // encode is pure: same text → same tokens regardless of partitioning
    val a = corpus.select(enc(col("text")).as("t")).collect().toSeq
    val b = corpus.repartition(5).select(enc(col("text")).as("t")).collect().toSeq
    a.toSet shouldBe b.toSet
  }

  test("maxWords caps the vocabulary deterministically (count desc, word asc)") {
    val corpus = Seq((1L, "aa aa aa bb bb cc")).toDF("id", "text")
    val wc = Bpe.wordCounts(corpus, "text", maxWords = 2)
      .as[(String, Long)].collect().toSeq
    wc shouldBe Seq(("aa", 3L), ("bb", 2L))
  }
}
