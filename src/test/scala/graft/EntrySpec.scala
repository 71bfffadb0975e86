package graft

import newspipe.SparkTestBase

/** The driver's t1 smoke contract: `SparkEntry.entry` runs the real
  * bronze→silver→gold chain over sf0.001 and must return rows.
  */
class EntrySpec extends SparkTestBase {
  test("entry: flagship silver→gold query returns rows on sf0.001") {
    val out = SparkEntry.entry(spark)
    out.columns should contain allOf ("PUBLISHED_DATE", "SENTIMENT_LABEL")
    out.count() should be > 0L
  }
}
