package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] exercises one operator row from SURVEY.md §2
  * (or an extension operator from §7), phrased over the driver-generated
  * TPC-H-ish tables at `/root/testdata/sf*` (TESTDATA.md). Each key with a
  * matching [[oracleSql]] entry is hash-compared against DuckDB by the
  * driver; column names are aliased identically on both sides.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Silver→gold sentiment-trends analytic (ref 03:142-147) over the
    * `documents` table adapted to the news-article shape.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val docs = t(spark, dir, "documents")
    val bronzeish = docs.select(
      col("source").as("source_name"),
      lit(null).cast("string").as("author"),
      col("text").as("title"),
      col("text").as("description"),
      concat(lit("https://"), col("source"), lit("/"), col("doc_id")).as("url"),
      lit(null).cast("string").as("urlToImage"),
      to_timestamp(lit("2026-01-01 00:00:00")).as("publishedAt"),
      col("text").as("content"),
      lit("2026-01-01T00:00:00Z").as("ingestion_time"),
      col("lang").as("country"))
    val silver = newspipe.pipeline.Silver.transform(bronzeish)
    silver.groupBy("PUBLISHED_DATE", "SENTIMENT_LABEL").count()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1-ish/TPC-H Q1: multi-key hash aggregate with several aggregates
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum("l_extendedprice").as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          avg("l_quantity").as("avg_qty"),
          avg("l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
