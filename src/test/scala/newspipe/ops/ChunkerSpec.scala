package newspipe.ops

import newspipe.SparkTestBase

/** Extension: fixed-size token chunking with overlap. */
class ChunkerSpec extends SparkTestBase {
  import spark.implicits._

  test("chunks stride by size-overlap, share exactly overlap tokens, keep the tail") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val out = Chunker.chunk(Seq((1L, text)).toDF("id", "text"),
        "id", "text", size = 5, overlap = 2)
      .orderBy("chunk_idx")
      .as[(Long, Long, String)].collect()
    out.map(_._2).toSeq shouldBe Seq(0L, 1L, 2L)
    out(0)._3 shouldBe "t1 t2 t3 t4 t5"
    out(1)._3 shouldBe "t4 t5 t6 t7 t8" // starts at 1+stride=4
    out(2)._3 shouldBe "t7 t8 t9 t10"   // tail, shorter than size
  }

  test("zero overlap partitions the tokens exactly") {
    val text = (1 to 9).map(i => s"t$i").mkString(" ")
    val out = Chunker.chunk(Seq((1L, text)).toDF("id", "text"),
        "id", "text", size = 3, overlap = 0)
      .orderBy("chunk_idx").as[(Long, Long, String)].collect()
    out.map(_._3).mkString(" ") shouldBe text
    out.length shouldBe 3
  }

  test("a doc shorter than size is one whole chunk; null/empty rows excluded") {
    val df = Seq((Option(1L), Option("only four tokens here")),
      (Option.empty[Long], Option("x y z")),
      (Option(3L), Option.empty[String]),
      (Option(4L), Option("??!!"))).toDF("id", "text")
    val out = Chunker.chunk(df, "id", "text", size = 30, overlap = 10)
      .as[(Long, Long, String)].collect()
    out.length shouldBe 1
    out.head shouldBe ((1L, 0L, "only four tokens here"))
  }

  test("every token position is covered; consecutive chunks overlap as configured") {
    val text = (1 to 47).map(i => s"w$i").mkString(" ")
    val out = Chunker.chunk(Seq((1L, text)).toDF("id", "text"),
        "id", "text", size = 12, overlap = 4)
      .orderBy("chunk_idx").as[(Long, Long, String)].collect()
    val chunks = out.map(_._3.split(" ").toSeq)
    chunks.flatten.distinct.length shouldBe 47 // full coverage
    chunks.sliding(2).filter(_.length == 2).foreach { pair =>
      pair(0).takeRight(4) shouldBe pair(1).take(4) // `overlap` shared tokens
    }
  }

  test("invalid size/overlap rejected") {
    val df = Seq((1L, "a b c")).toDF("id", "text")
    intercept[IllegalArgumentException](Chunker.chunk(df, "id", "text", 0))
    intercept[IllegalArgumentException](Chunker.chunk(df, "id", "text", 5, 5))
  }
}
