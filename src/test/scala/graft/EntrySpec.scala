package graft

import newspipe.SparkTestBase

/** The driver's flagship smoke: entry(spark) must return rows at sf0.001. */
class EntrySpec extends SparkTestBase {
  test("SparkEntry.entry returns a non-empty sentiment-trends frame") {
    val df = SparkEntry.entry(spark)
    df.columns shouldBe Array("PUBLISHED_DATE", "SENTIMENT_LABEL", "count")
    df.count() should be > 0L
  }
}
