package graft

import newspipe.dq.{DqConfig, NativeDq}
import newspipe.functions.{Keys, SentimentAnalyzer, TextFunctions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] exercises one operator row from SURVEY.md §2
  * (or an extension operator from §7), phrased over the driver-generated
  * TPC-H-ish tables at `/root/testdata/sf*` (TESTDATA.md). Each key with a
  * matching [[oracleSql]] entry is hash-compared against DuckDB by the
  * driver; column names are aliased identically on both sides and every
  * query carries a deterministic total ORDER BY.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** documents table re-shaped to the bronze article layout so the real
    * Silver/Gold pipeline code runs over driver testdata (source≈publisher,
    * text≈title/content, lang≈country — see FIXTURES.md §B).
    */
  private def docsAsArticles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(
      col("source").as("source_name"),
      concat(lit("author_"), (col("doc_id") % 7).cast(StringType)).as("author"),
      col("text").as("title"),
      col("text").as("description"),
      concat(lit("https://www."), col("source"), lit(".example.com/"),
        col("doc_id").cast(StringType)).as("url"),
      lit(null).cast(StringType).as("urlToImage"),
      to_timestamp(date_add(lit("2026-01-01").cast("date"),
        (col("doc_id") % 30).cast("int"))).as("publishedAt"),
      col("text").as("content"),
      lit("2026-01-01T00:00:00Z").as("ingestion_time"),
      col("lang").as("country"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full bronze→silver→gold run: Silver.transform (HTML strip, domain
    * extraction, sentiment UDF, rename) then the gold sentiment-trends
    * analytic (ref 03:140-146).
    */
  def entry(spark: SparkSession): DataFrame = {
    val silver = newspipe.pipeline.Silver.transform(
      docsAsArticles(spark, "/root/testdata/sf0.001"))
    newspipe.pipeline.Gold.sentimentTrends(silver)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Aggregations (§2.4) ----------------------------------------------

    // A1-A4 shape + TPC-H Q1: multi-key hash aggregate, several aggregates
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
    }),

    // A1 + P6: duplicate-key detection — groupBy().count().filter("count > 1")
    // (the DQ unique-keys rule, _lib:138-145)
    "q09_dup_detect" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_orderkey").count()
        .filter("count > 1")
        .orderBy("l_orderkey")
    }),

    // A2: top publishers analytic (ref 03:131-137) over documents.source
    "q10_top_sources" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy("source").count()
        .orderBy(desc("count"), asc("source"))
    }),

    // A3: two-key date trend (ref 03:140-146 shape) over events.
    // `ts` arrives as LongType ns-since-epoch (nanosAsLong — Spark has no
    // nanosecond timestamp type); convert via timestamp_micros.
    "q11_event_trends" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(to_date(timestamp_micros(expr("ts DIV 1000"))).as("event_date"),
          col("event_type"))
        .count()
        .orderBy("event_date", "event_type")
    }),

    // A4: country-distribution analytic (ref 03:148-153) over documents.lang
    "q12_lang_distribution" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy("lang").count()
        .orderBy(desc("count"), asc("lang"))
    }),

    // A5: distinct() for dimension builds (ref 03:37,42)
    "q13_distinct" -> ((s, dir) =>
      t(s, dir, "documents").select("source").distinct().orderBy("source")),

    // A6: dropDuplicates(subset) (ref 02:66)
    "q14_dropdup_subset" -> ((s, dir) => {
      t(s, dir, "documents")
        .dropDuplicates("source", "lang")
        .select("source", "lang")
        .orderBy("source", "lang")
    }),

    // ---- Projection / scalar functions (§2.2, §2.8) ------------------------

    // P1/P2 + F2-F5/F9: projection with upper/lower/substr/length/to_date
    "q02_project_scalar" -> ((s, dir) => {
      t(s, dir, "orders").select(
          col("o_orderkey"),
          upper(col("o_orderstatus")).as("status_u"),
          lower(col("o_orderpriority")).as("prio_lower"),
          substring(col("o_orderpriority"), 1, 3).as("prio3"),
          length(col("o_orderpriority")).as("prio_len"),
          to_date(col("o_orderdate")).as("order_date"))
        .orderBy("o_orderkey")
    }),

    // P5/P6: predicate filter incl. the DQ null-or-empty form (_lib:125)
    "q03_filter" -> ((s, dir) => {
      val ls = when(col("l_linestatus") === "F", lit(null).cast(StringType))
        .otherwise(col("l_linestatus"))
      t(s, dir, "lineitem")
        .withColumn("ls_nullable", ls)
        .filter(col("l_quantity") > 30 && col("l_returnflag") === "R")
        .filter(col("ls_nullable").isNull || col("ls_nullable") === "")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // P7/P8: dropna(subset) + fillna (ref 02:65, 03:51)
    "q04_null_handling" -> ((s, dir) => {
      val prio = when(col("o_orderpriority") === "3-MEDIUM",
        lit(null).cast(StringType)).otherwise(col("o_orderpriority"))
      val status = when(col("o_orderstatus") === "P",
        lit(null).cast(StringType)).otherwise(col("o_orderstatus"))
      t(s, dir, "orders")
        .withColumn("prio_n", prio)
        .withColumn("status_n", status)
        .na.drop(Seq("status_n"))            // P7: drop rows with null status
        .na.fill("UNKNOWN", Seq("prio_n"))   // P8: default the rest
        .groupBy("prio_n", "status_n").count()
        .orderBy("prio_n", "status_n")
    }),

    // ---- Joins (§2.3) -------------------------------------------------------

    // J1: inner equi-join, small dim broadcast (ref _lib:159)
    "q06_join_broadcast" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(sum("o_totalprice").as("segment_revenue"),
          count(lit(1)).as("order_count"))
        .orderBy("c_mktsegment")
    }),

    // J2: left-anti join — the DQ valid-rows split (ref _lib:160).
    // Anti against a filtered right side so the result is non-empty at
    // every SF (every customer has SOME order in this data).
    "q07_left_anti" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // J3: star join fact ⋈ dims (ref 03:54-55 shape, TPC-H Q5-ish)
    "q08_star_join" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("line_count"))
        .orderBy("r_name", "n_name")
    }),

    // ---- Window / surrogate keys (§2.5) ------------------------------------

    // W1-W4: distinct → row_number over global order → cast → substr(1,5)
    "q15_surrogate_dim" -> ((s, dir) => {
      t(s, dir, "part").select("p_brand").distinct()
        .withColumn("brand_id", Keys.legacyRowNumberKey("p_brand"))
        .orderBy("p_brand")
    }),

    // ---- Sorts / limits (§2.6) ----------------------------------------------

    // O1 + top-k: global sort desc with limit → TakeOrderedAndProject
    "q16_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    }),

    // ---- Set ops (§2.7) -----------------------------------------------------

    // U1: union + dropDuplicates (the DQ bad-key accumulator, _lib:131,144)
    "q17_union_dedup" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .dropDuplicates()
        .orderBy("nk")
    }),

    // ---- Text / regex (§2.8 F6-F7, §2.9 X1) ---------------------------------

    // F6 domain extraction + X1 HTML strip (native regexp_replace) + F7 length
    "q18_regex_text" -> ((s, dir) => {
      val url = concat(lit("https://www."), col("source"),
        lit(".example.com/"), col("doc_id").cast(StringType))
      val tagged = concat(lit("<b>"), col("text"), lit("</b>"))
      t(s, dir, "documents").select(
          col("doc_id"),
          TextFunctions.extractDomain(url).as("domain"),
          length(TextFunctions.removeHtmlTags(tagged)).as("clean_len"),
          TextFunctions.charCount(col("text")).as("char_count"))
        .orderBy("doc_id")
    }),

    // ---- DQ framework (§2.10) ----------------------------------------------

    // Native one-pass DQ split: valid = unique-keyed, not-null rows
    "q19_dq_native" -> ((s, dir) => {
      val cfg = DqConfig(table = "lineitem",
        requiredColumns = Seq("l_orderkey", "l_returnflag"),
        notNull = Seq("l_returnflag"),
        uniqueKeys = Seq("l_orderkey"))
      NativeDq.run(t(s, dir, "lineitem"), cfg).valid
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- Full pipeline (§3, no oracle: sentiment UDF) -----------------------

    // X2 sentiment + silver→gold trends over documents-as-articles
    "q20_pipeline_sentiment" -> ((s, dir) => {
      val silver = newspipe.pipeline.Silver.transform(docsAsArticles(s, dir))
      newspipe.pipeline.Gold.sentimentTrends(silver)
    }),

    // Gold dims + fact star build (ref 03:36-77), md5 scale-safe keys
    "q21_gold_fact" -> ((s, dir) => {
      val silver = newspipe.pipeline.Silver.transform(docsAsArticles(s, dir))
      val (ds, da, fact) = newspipe.pipeline.Gold.build(silver, keyMode = "md5")
      fact.select("ARTICLE_ID", "SOURCE_ID", "AUTHOR_ID", "DOMAIN", "COUNTRY", "URL")
        .orderBy("URL")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops (sentiment).
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
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q09_dup_detect" ->
      """SELECT l_orderkey, count(*) AS count
        |FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1
        |ORDER BY l_orderkey""".stripMargin,

    "q10_top_sources" ->
      """SELECT source, count(*) AS count FROM documents
        |GROUP BY source ORDER BY count DESC, source""".stripMargin,

    "q11_event_trends" ->
      """SELECT CAST(ts AS DATE) AS event_date, event_type, count(*) AS count
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q12_lang_distribution" ->
      """SELECT lang, count(*) AS count FROM documents
        |GROUP BY lang ORDER BY count DESC, lang""".stripMargin,

    "q13_distinct" ->
      "SELECT DISTINCT source FROM documents ORDER BY source",

    "q14_dropdup_subset" ->
      "SELECT DISTINCT source, lang FROM documents ORDER BY source, lang",

    "q02_project_scalar" ->
      """SELECT o_orderkey,
        |  upper(o_orderstatus) AS status_u,
        |  lower(o_orderpriority) AS prio_lower,
        |  substr(o_orderpriority, 1, 3) AS prio3,
        |  CAST(length(o_orderpriority) AS INTEGER) AS prio_len,
        |  CAST(o_orderdate AS DATE) AS order_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q03_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 30 AND l_returnflag = 'R'
        |  AND (nullif(l_linestatus, 'F') IS NULL OR nullif(l_linestatus, 'F') = '')
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q04_null_handling" ->
      """SELECT coalesce(nullif(o_orderpriority, '3-MEDIUM'), 'UNKNOWN') AS prio_n,
        |  o_orderstatus AS status_n, count(*) AS count
        |FROM orders
        |WHERE nullif(o_orderstatus, 'P') IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q06_join_broadcast" ->
      """SELECT c_mktsegment,
        |  sum(o_totalprice) AS segment_revenue,
        |  count(*) AS order_count
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q07_left_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q08_star_join" ->
      """SELECT r_name, n_name,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue,
        |  count(*) AS line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q15_surrogate_dim" ->
      """SELECT p_brand,
        |  substr(CAST(row_number() OVER (ORDER BY p_brand) AS VARCHAR), 1, 5) AS brand_id
        |FROM (SELECT DISTINCT p_brand FROM part)
        |ORDER BY p_brand""".stripMargin,

    "q16_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q17_union_dedup" ->
      """SELECT DISTINCT nk FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL SELECT s_nationkey AS nk FROM supplier)
        |ORDER BY nk""".stripMargin,

    "q18_regex_text" ->
      """SELECT doc_id,
        |  regexp_extract('https://www.' || source || '.example.com/' || CAST(doc_id AS VARCHAR),
        |    'https?://(?:www\.)?([^/]+)', 1) AS domain,
        |  CAST(length(regexp_replace('<b>' || text || '</b>', '<.*?>', '', 'g')) AS INTEGER) AS clean_len,
        |  CAST(length(text) AS INTEGER) AS char_count
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q19_dq_native" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_returnflag IS NOT NULL AND l_returnflag <> ''
        |  AND l_orderkey IN (
        |    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING count(*) = 1)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
