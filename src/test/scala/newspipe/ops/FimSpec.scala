package newspipe.ops

import newspipe.SparkTestBase

/** FIM reordering: closed-form split arithmetic against a reference
  * implementation, pass-through rules, determinism.
  */
class FimSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference replay of the op's hash arithmetic. */
  private def refH(salt: String, id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16)
  }

  private def refFim(id: Long, text: String): (Boolean, String) = {
    if (text == null || text.length <= 1) return (false, text)
    val applied = refH("fim:apply", id) < (0.5 * 4294967296.0).toLong
    if (!applied) return (false, text)
    val l = text.length
    val p1 = (refH("fim:p1", id) % (l + 1)).toInt
    val p2 = (refH("fim:p2", id) % (l + 1)).toInt
    val a = math.min(p1, p2); val b = math.max(p1, p2)
    (true, "<fim_prefix>" + text.substring(0, a) +
      "<fim_suffix>" + text.substring(b) +
      "<fim_middle>" + text.substring(a, b))
  }

  test("matches the reference arithmetic exactly over many ids") {
    val docs = (1L to 200L).map(i => (i, s"doc $i body with some content"))
      .toDF("id", "text")
    val got = Fim.transform(docs, "id", "text")
      .select("id", "fim_applied", "fim_text")
      .as[(Long, Boolean, String)].collect().sortBy(_._1)
    got.foreach { case (id, applied, out) =>
      val (ea, eo) = refFim(id, s"doc $id body with some content")
      applied shouldBe ea
      out shouldBe eo
    }
    // roughly half apply at fraction 0.5 (binomial, wide margin)
    val n = got.count(_._2)
    n should (be > 60 and be < 140)
    // reordered docs keep every original character (sentinels aside)
    got.filter(_._2).foreach { case (id, _, out) =>
      val stripped = out.replace("<fim_prefix>", "")
        .replace("<fim_suffix>", "").replace("<fim_middle>", "")
      stripped.sorted shouldBe s"doc $id body with some content".sorted
    }
  }

  test("null, empty and single-char docs pass through unchanged") {
    val docs = Seq((1L, null), (2L, ""), (3L, "x"))
      .toDF("id", "text")
    val got = Fim.transform(docs, "id", "text", fraction = 1.0)
      .select("id", "fim_applied", "fim_text")
      .as[(Long, Boolean, String)].collect().sortBy(_._1)
    got.map(_._2).toSeq shouldBe Seq(false, false, false)
    got.map(_._3).toSeq shouldBe Seq(null, "", "x")
  }

  test("fraction bounds: 0 transforms nothing, 1 transforms every eligible doc") {
    val docs = (1L to 50L).map(i => (i, s"text $i")).toDF("id", "text")
    Fim.transform(docs, "id", "text", fraction = 0.0)
      .filter($"fim_applied").count() shouldBe 0L
    Fim.transform(docs, "id", "text", fraction = 1.0)
      .filter(!$"fim_applied").count() shouldBe 0L
  }

  test("partitioning-invariant (content-addressed, no rand())") {
    val docs = (1L to 100L).map(i => (i, s"body $i etc")).toDF("id", "text")
    val a = Fim.transform(docs, "id", "text")
      .select("id", "fim_text").as[(Long, String)].collect().sortBy(_._1)
    val b = Fim.transform(docs.repartition(17), "id", "text")
      .select("id", "fim_text").as[(Long, String)].collect().sortBy(_._1)
    a shouldBe b
  }
}
