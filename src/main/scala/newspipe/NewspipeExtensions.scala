package newspipe

import newspipe.functions.DoubleDot
import org.apache.spark.sql.{NewspipeSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers newspipe's native Catalyst
  * expressions as SQL functions, so `spark.sql` users get the same codegen'd
  * kernels the DataFrame API uses.
  *
  * Deployment: `spark.sql.extensions=newspipe.NewspipeExtensions` (applied at
  * session build). For an already-running session (tests, notebooks) use
  * [[NewspipeExtensions.register]].
  */
class NewspipeExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    NewspipeExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    NewspipeExtensions.tableFunctions.foreach { case (ident, info, builder) =>
      ext.injectTableFunction((ident, info, builder))
    }
    // SQL DML over lake layers (DELETE FROM / UPDATE / MERGE INTO
    // lake.`<base>`.`<layer>`): the delegate parses the standard grammar,
    // LakeSql.translate recognizes lake targets and substitutes the
    // runnable row-op command — zero hand-rolled grammar (see LakeSql)
    ext.injectParser((_, delegate) => new LakeDmlParser(delegate))
    // catalog-resolved lake reads (SELECT … FROM lake.db.docs) rewrite to
    // the Lake.read v1 plan — LakeFileIndex scan, stats skipping, DV
    // filtering — so SQL and the Scala API share one physical plan
    ext.injectResolutionRule(session =>
      new newspipe.io.LakeV2ReadRewrite(session))
    // metadata-only count(*) over LakeFileIndex-backed scans (Delta's
    // OptimizeMetadataOnlyQuery role) — see LakeCountStarShortcut
    ext.injectOptimizerRule(session =>
      new newspipe.io.LakeCountStarShortcut(session))
  }
}

/** Delegating parser: everything parses through `delegate`; the three DML
  * plan shapes with a `lake`.`base`.`layer` target become
  * [[newspipe.io.LakeDmlCommand]] (they would otherwise die in analysis —
  * v1 relations don't support row-level ops).
  */
final class LakeDmlParser(
    delegate: org.apache.spark.sql.catalyst.parser.ParserInterface)
    extends org.apache.spark.sql.catalyst.parser.ParserInterface {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  override def parsePlan(sqlText: String): LogicalPlan = {
    // maintenance statements FIRST: OPTIMIZE/VACUUM/RESTORE are not in
    // Spark's grammar at all, so the delegate would throw ParseException
    // before translate could run (anchored-keyword regexes — non-matching
    // text skips in O(1))
    newspipe.io.LakeSql.parseMaintenance(sqlText) match {
      case Some(m) => return newspipe.io.LakeMaintCommand(m)
      case None => ()
    }
    val plan = delegate.parsePlan(sqlText)
    newspipe.io.LakeSql.translate(plan).map {
      case p if newspipe.io.LakeSql.isProps(p) =>
        newspipe.io.LakePropsCommand(p): LogicalPlan
      case dml => newspipe.io.LakeDmlCommand(dml): LogicalPlan
    }.getOrElse(plan)
  }
  override def parseExpression(sqlText: String) =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String) = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String) =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String) =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) = delegate.parseDataType(sqlText)
}

object NewspipeExtensions {

  import org.apache.spark.sql.Column

  /** Wrap a 1-arg Column-composition operator as a SQL function builder:
    * SQL argument expressions → Columns → the library's composite Column →
    * back to the Expression the registry needs. The SQL user gets the SAME
    * plan (native expressions / in-JVM UDF kernels) as the DataFrame API.
    */
  private def fn1(name: String)(f: Column => Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("newspipe.NewspipeExtensions", name),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"$name(x) takes exactly 1 argument")
        NewspipeSqlBridge.convertedExpression(
          f(NewspipeSqlBridge.column(children.head)))
      })

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq((
      new FunctionIdentifier("double_dot"),
      new ExpressionInfo(classOf[DoubleDot].getName, "double_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "double_dot(a, b) takes exactly 2 arguments")
        DoubleDot(children.head, children(1))
      }),
      (new FunctionIdentifier("winnow_fingerprints"),
        new ExpressionInfo(
          classOf[newspipe.functions.WinnowFingerprints].getName,
          "winnow_fingerprints"),
        (children: Seq[Expression]) => {
          require(children.length == 3,
            "winnow_fingerprints(tokens, k, w) takes exactly 3 arguments")
          newspipe.functions.WinnowFingerprints(children.head,
            numericArg("winnow_fingerprints k", children(1)).intValue(),
            numericArg("winnow_fingerprints w", children(2)).intValue())
        }),
      (new FunctionIdentifier("unicode_normalize"),
        new ExpressionInfo(
          classOf[newspipe.functions.UnicodeNormalize].getName,
          "unicode_normalize"),
        (children: Seq[Expression]) => {
          require(children.length == 2,
            "unicode_normalize(text, form) takes exactly 2 arguments")
          newspipe.functions.UnicodeNormalize(children.head,
            stringArg("unicode_normalize form", children(1)))
        })) ++ {
      import newspipe.functions.{SentimentAnalyzer, TextFunctions}
      import newspipe.ops.{Dedup, TextStats}
      Seq(
        fn1("html_strip")(TextFunctions.removeHtmlTags),
        fn1("extract_domain")(TextFunctions.extractDomain),
        fn1("sentiment")(SentimentAnalyzer.sentiment(_)),
        // TextBlob/pattern float-parity mode over the en-sentiment.xml-format
        // lexicon (see PatternSentiment)
        fn1("sentiment_textblob")(newspipe.functions.PatternSentiment.sentiment),
        fn1("word_count")(TextStats.wordCount),
        fn1("bpeish_token_count")(TextStats.bpeishTokenCount),
        fn1("punct_ratio")(TextStats.punctRatio),
        fn1("stopword_ratio")(TextStats.stopwordRatio(_)),
        fn1("avg_word_len")(TextStats.avgWordLen),
        fn1("quality_score")(TextStats.qualityScore),
        fn1("dup_token_ratio")(TextStats.duplicateTokenRatio),
        fn1("top_bigram_fraction")(TextStats.topBigramFraction),
        fn1("redact_pii")(TextStats.redactPii(_)),
        fn1("clean_text")(TextStats.cleanText),
        fn1("gopher_rules")(TextStats.gopherRules),
        fn1("pii_match_count")(TextStats.piiMatchCount),
        fn1("lang_id")(TextStats.langId),
        fn1("normalized_fingerprint")(TextStats.normalizedFingerprint),
        fn1("rolling_fingerprint")(TextStats.rollingFingerprint),
        fn1("simhash")(Dedup.simhash),
        fn1("tokens")(Dedup.tokens),
        fn1("shingles")(Dedup.shingles(_)),
        // native MinHash over an array<string> shingle column (pair with
        // shingles(text)); 64 hashes, the operators' default
        fn1("minhash_signature")(Dedup.minhashSignature(_)))
    }

  // ---- table functions (FROM-position: the two composite JOIN operators) --

  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  private def stringArg(fn: String, e: Expression): String = {
    require(e.foldable && e.dataType ==
      org.apache.spark.sql.types.StringType,
      s"$fn takes string literals (table/column names); got $e")
    val v = e.eval()
    require(v != null, s"$fn arguments must be non-null")
    v.toString
  }

  /** The ONE numeric-literal extractor every function builder shares —
    * handles integral, floating, and Decimal literal shapes alike (SQL
    * `0.8` evaluates to a Decimal, not a Number), so every registered
    * function accepts the same literal forms.
    */
  private def numericArg(fn: String, e: Expression): java.math.BigDecimal = {
    require(e.foldable, s"$fn numeric arguments must be literals; got $e")
    e.eval() match {
      case n: java.lang.Number => new java.math.BigDecimal(n.toString)
      case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
      case null => throw new IllegalArgumentException(
        s"$fn expects a non-null numeric literal")
      case other => throw new IllegalArgumentException(
        s"$fn expects a numeric literal, got '$other'")
    }
  }

  private def longArg(fn: String, e: Expression): Long =
    numericArg(fn, e).longValue()

  private def doubleArg(fn: String, e: Expression): Double =
    numericArg(fn, e).doubleValue()

  /** `SELECT … FROM asof_join('clicks', 'purchases', 'user_id', 'ts')` and
    * `… FROM range_join('points', 'windows', 'x', 's', 'e', 16)`: the
    * composite join operators in FROM position. Arguments are literals
    * (table or view names resolved through the session catalog); the builder
    * returns the SAME composed plan the DataFrame API produces, unanalyzed,
    * so the outer query's analyzer resolves it in place.
    */
  private val tableFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] =
    Seq(
      // lake reads in FROM position — the SQL surface of the snapshot
      // protocol: SELECT … FROM lake_read('/lake/root', 'docs');
      // lake_read_version pins a snapshot (reproducibility), lake_read_asof
      // resolves timestamp-ms time travel. All lazy: building the plan
      // resolves only the snapshot pointer (one listing), no data jobs.
      (new FunctionIdentifier("lake_read"),
        new ExpressionInfo("newspipe.NewspipeExtensions", "lake_read"),
        (children: Seq[Expression]) => {
          require(children.length == 2,
            "lake_read(base_path, layer) takes 2 arguments")
          val args = children.map(stringArg("lake_read", _))
          val spark = SparkSession.active
          NewspipeSqlBridge.logicalPlan(new newspipe.io.Lake(spark,
            newspipe.io.LakeConfig(basePath = args(0))).read(args(1)))
        }),
      (new FunctionIdentifier("lake_read_version"),
        new ExpressionInfo("newspipe.NewspipeExtensions", "lake_read_version"),
        (children: Seq[Expression]) => {
          require(children.length == 3,
            "lake_read_version(base_path, layer, version) takes 3 arguments")
          val args = children.map(stringArg("lake_read_version", _))
          val spark = SparkSession.active
          NewspipeSqlBridge.logicalPlan(new newspipe.io.Lake(spark,
            newspipe.io.LakeConfig(basePath = args(0)))
            .readVersion(args(1), args(2)))
        }),
      (new FunctionIdentifier("lake_read_asof"),
        new ExpressionInfo("newspipe.NewspipeExtensions", "lake_read_asof"),
        (children: Seq[Expression]) => {
          require(children.length == 3,
            "lake_read_asof(base_path, layer, timestamp_ms) takes 3 arguments")
          val base = stringArg("lake_read_asof", children(0))
          val layer = stringArg("lake_read_asof", children(1))
          val ts = longArg("lake_read_asof", children(2))
          val spark = SparkSession.active
          NewspipeSqlBridge.logicalPlan(new newspipe.io.Lake(spark,
            newspipe.io.LakeConfig(basePath = base)).readAsOf(layer, ts))
        }),
      // Delta's table_changes() in FROM position: every row-level change
      // between two committed versions, tagged _change_type /
      // _commit_version / _commit_timestamp. The keyed form classifies
      // updates into pre/post-images. Lazy like the reads: building the
      // plan walks only the version slice's manifests.
      (new FunctionIdentifier("lake_changes"),
        new ExpressionInfo("newspipe.NewspipeExtensions", "lake_changes"),
        (children: Seq[Expression]) => {
          require(children.length == 4,
            "lake_changes(base_path, layer, from_version, to_version) " +
              "takes 4 arguments")
          val args = children.map(stringArg("lake_changes", _))
          val spark = SparkSession.active
          NewspipeSqlBridge.logicalPlan(new newspipe.io.Lake(spark,
            newspipe.io.LakeConfig(basePath = args(0)))
            .changeFeed(args(1), args(2), args(3)))
        }),
      (new FunctionIdentifier("lake_changes_keyed"),
        new ExpressionInfo("newspipe.NewspipeExtensions", "lake_changes_keyed"),
        (children: Seq[Expression]) => {
          require(children.length == 5,
            "lake_changes_keyed(base_path, layer, from_version, to_version, " +
              "key_cols_csv) takes 5 arguments")
          val args = children.map(stringArg("lake_changes_keyed", _))
          val keys = args(4).split(',').map(_.trim).filter(_.nonEmpty).toSeq
          val spark = SparkSession.active
          NewspipeSqlBridge.logicalPlan(new newspipe.io.Lake(spark,
            newspipe.io.LakeConfig(basePath = args(0)))
            .changeFeedKeyed(args(1), args(2), args(3), keys))
        }),
      // the ROW-ID-attributed change feed in FROM position (row-tracking
      // layers, no key declaration): update pre/post images share one
      // _row_id, compactions contribute nothing
      (new FunctionIdentifier("lake_changes_tracked"),
        new ExpressionInfo("newspipe.NewspipeExtensions",
          "lake_changes_tracked"),
        (children: Seq[Expression]) => {
          require(children.length == 4,
            "lake_changes_tracked(base_path, layer, from_version, " +
              "to_version) takes 4 arguments")
          val args = children.map(stringArg("lake_changes_tracked", _))
          val spark = SparkSession.active
          NewspipeSqlBridge.logicalPlan(new newspipe.io.Lake(spark,
            newspipe.io.LakeConfig(basePath = args(0)))
            .changeFeedTracked(args(1), args(2), args(3)))
        }),
      // commit history in FROM position (Delta's DESCRIBE HISTORY as a
      // queryable table): SELECT * FROM lake_history('/lake/root','docs')
      // → (ordinal, version, operation, parent), oldest first; an
      // optional 3rd arg is DESCRIBE HISTORY's LIMIT (n newest commits)
      (new FunctionIdentifier("lake_history"),
        new ExpressionInfo("newspipe.NewspipeExtensions", "lake_history"),
        (children: Seq[Expression]) => {
          require(children.length == 2 || children.length == 3,
            "lake_history(base_path, layer[, limit]) takes 2 or 3 arguments")
          val args = children.take(2).map(stringArg("lake_history", _))
          val limit = children.drop(2).headOption
            .map(longArg("lake_history", _).toInt)
          val spark = SparkSession.active
          NewspipeSqlBridge.logicalPlan(new newspipe.io.Lake(spark,
            newspipe.io.LakeConfig(basePath = args(0)))
            .history(args(1), limit))
        }),
      // persisted-ANN search in FROM position: SELECT * FROM
      // lake_vector_search('/lake/root', 'docs', 'queries_view', 5
      // [, 'index_name']) → (query_id, neighbor_id, cos, rank) — reads
      // index artifacts only, never the corpus (Lake.vectorSearch)
      (new FunctionIdentifier("lake_vector_search"),
        new ExpressionInfo("newspipe.NewspipeExtensions",
          "lake_vector_search"),
        (children: Seq[Expression]) => {
          require(children.length >= 4 && children.length <= 7,
            "lake_vector_search(base_path, layer, queries_table, k" +
              "[, index_name[, filter_sql[, shard_probe]]]) takes 4 to " +
              "7 arguments")
          val base = stringArg("lake_vector_search", children(0))
          val layer = stringArg("lake_vector_search", children(1))
          val qTable = stringArg("lake_vector_search", children(2))
          val k = longArg("lake_vector_search", children(3)).toInt
          val idx = children.lift(4).map(stringArg("lake_vector_search", _))
            .filter(_.nonEmpty)
          val filt = children.lift(5)
            .map(stringArg("lake_vector_search", _))
            .filter(_.nonEmpty)
            .map(org.apache.spark.sql.functions.expr)
          // 7th arg: coarse-routing probe fraction (default 1.0 probes
          // every covered shard — identical to the unrouted plan)
          val probe = children.lift(6)
            .map(doubleArg("lake_vector_search", _)).getOrElse(1.0)
          val spark = SparkSession.active
          NewspipeSqlBridge.logicalPlan(new newspipe.io.Lake(spark,
            newspipe.io.LakeConfig(basePath = base))
            .vectorSearch(layer, spark.table(qTable), k, idx,
              filter = filt, shardProbe = probe))
        }),
      // persisted-signature near-dedup in FROM position: SELECT * FROM
      // lake_near_dups('/lake/root', 'docs'[, 'since_version'[,
      // 'index_name']]) → (id_a, id_b, jaccard) — candidates join
      // artifact against artifact; text is read only to verify. Lazy
      // (eager=false): a bare EXPLAIN must not launch jobs.
      (new FunctionIdentifier("lake_near_dups"),
        new ExpressionInfo("newspipe.NewspipeExtensions",
          "lake_near_dups"),
        (children: Seq[Expression]) => {
          require(children.length >= 2 && children.length <= 4,
            "lake_near_dups(base_path, layer[, since_version[, " +
              "index_name]]) takes 2 to 4 arguments")
          val base = stringArg("lake_near_dups", children(0))
          val layer = stringArg("lake_near_dups", children(1))
          val since = children.lift(2).map(stringArg("lake_near_dups", _))
            .filter(_.nonEmpty)
          val idx = children.lift(3).map(stringArg("lake_near_dups", _))
            .filter(_.nonEmpty)
          val spark = SparkSession.active
          NewspipeSqlBridge.logicalPlan(new newspipe.io.Lake(spark,
            newspipe.io.LakeConfig(basePath = base))
            .nearDups(layer, idx, since, eager = false))
        }),
      // incremental SEMANTIC near-dedup in FROM position: SELECT * FROM
      // lake_vector_near_dups('/lake/root', 'docs', 'since_version',
      // 0.95 [, 'index_name']) → (id_a, id_b, cos) — exact
      // cosine-threshold pairs of the post-since landing vs the whole
      // corpus, answered from the vector index artifacts. EAGER by
      // design (unlike lake_near_dups): the bounded-chunk landing loop
      // streams at plan-build time, so a bare EXPLAIN launches the
      // landing jobs — documented in Lake.vectorNearDups
      (new FunctionIdentifier("lake_vector_near_dups"),
        new ExpressionInfo("newspipe.NewspipeExtensions",
          "lake_vector_near_dups"),
        (children: Seq[Expression]) => {
          require(children.length == 4 || children.length == 5,
            "lake_vector_near_dups(base_path, layer, since_version, " +
              "threshold[, index_name]) takes 4 or 5 arguments")
          val base = stringArg("lake_vector_near_dups", children(0))
          val layer = stringArg("lake_vector_near_dups", children(1))
          val since = stringArg("lake_vector_near_dups", children(2))
          val threshold = doubleArg("lake_vector_near_dups", children(3))
          val idx = children.lift(4)
            .map(stringArg("lake_vector_near_dups", _)).filter(_.nonEmpty)
          val spark = SparkSession.active
          NewspipeSqlBridge.logicalPlan(new newspipe.io.Lake(spark,
            newspipe.io.LakeConfig(basePath = base))
            .vectorNearDups(layer, since, threshold, idx))
        }),
      (new FunctionIdentifier("asof_join"),
        new ExpressionInfo("newspipe.NewspipeExtensions", "asof_join"),
        (children: Seq[Expression]) => {
          require(children.length == 4,
            "asof_join(left_table, right_table, key_col, ts_col) takes 4 arguments")
          val args = children.map(stringArg("asof_join", _))
          val spark = SparkSession.active
          NewspipeSqlBridge.logicalPlan(newspipe.ops.AsOfJoin.asOf(
            spark.table(args(0)), spark.table(args(1)), args(2), args(3)))
        }),
      (new FunctionIdentifier("range_join"),
        new ExpressionInfo("newspipe.NewspipeExtensions", "range_join"),
        (children: Seq[Expression]) => {
          require(children.length == 6,
            "range_join(points_table, intervals_table, point_col, start_col, " +
              "end_col, bucket_width) takes 6 arguments")
          val names = children.take(5).map(stringArg("range_join", _))
          val width = longArg("range_join", children(5))
          val spark = SparkSession.active
          NewspipeSqlBridge.logicalPlan(newspipe.ops.RangeJoin.intervalJoin(
            spark.table(names(0)), spark.table(names(1)),
            names(2), names(3), names(4), width))
        }),
      (new FunctionIdentifier("winnow_pairs"),
        new ExpressionInfo("newspipe.NewspipeExtensions", "winnow_pairs"),
        (children: Seq[Expression]) => {
          require(children.length == 4,
            "winnow_pairs(table, id_col, text_col, min_shared) takes 4 arguments")
          val names = children.take(3).map(stringArg("winnow_pairs", _))
          val minShared = longArg("winnow_pairs", children(3))
          val spark = SparkSession.active
          NewspipeSqlBridge.logicalPlan(newspipe.ops.Winnow.nearDupPairs(
            spark.table(names(0)), names(1), names(2),
            minShared = minShared))
        }),
      // verified MinHash near-dup pairs from SQL FROM position:
      //   SELECT * FROM minhash_pairs('docs', 'id', 'text', 0.8)
      // → (id_a, id_b, jaccard). Built LAZY (`eager = false`): resolution
      // and EXPLAIN launch no jobs, every leg scans the table at execution
      // time like any other SQL — the candidate subtree re-evaluates per
      // verify branch instead of being checkpointed (the DataFrame API
      // keeps the eager one-materialization form).
      (new FunctionIdentifier("minhash_pairs"),
        new ExpressionInfo("newspipe.NewspipeExtensions", "minhash_pairs"),
        (children: Seq[Expression]) => {
          require(children.length == 4,
            "minhash_pairs(table, id_col, text_col, threshold) takes 4 arguments")
          val names = children.take(3).map(stringArg("minhash_pairs", _))
          val threshold = doubleArg("minhash_pairs", children(3))
          require(threshold > 0.0 && threshold <= 1.0,
            s"minhash_pairs threshold must be in (0, 1], got $threshold")
          val spark = SparkSession.active
          val docs = spark.table(names(0))
          val cand = newspipe.ops.Dedup.minhashCandidates(docs, names(1), names(2))
          NewspipeSqlBridge.logicalPlan(newspipe.ops.Dedup.jaccardVerify(
            cand, docs, names(1), names(2), threshold = threshold,
            eager = false))
        }),
      // fixed-size token chunking in FROM position:
      //   SELECT * FROM chunk('docs', 'doc_id', 'text', 128[, 16])
      // → (doc_id, chunk_idx, chunk_text)
      (new FunctionIdentifier("chunk"),
        new ExpressionInfo("newspipe.NewspipeExtensions", "chunk"),
        (children: Seq[Expression]) => {
          require(children.length == 4 || children.length == 5,
            "chunk(table, id_col, text_col, size[, overlap]) takes 4-5 arguments")
          val names = children.take(3).map(stringArg("chunk", _))
          val size = longArg("chunk", children(3)).intValue()
          val overlap =
            if (children.length == 5) longArg("chunk", children(4)).intValue() else 0
          val spark = SparkSession.active
          NewspipeSqlBridge.logicalPlan(newspipe.ops.Chunker.chunk(
            spark.table(names(0)), names(1), names(2), size, overlap))
        }),
      // bulk kNN self-join (knn-graph build) in FROM position:
      //   SELECT * FROM knn_join('embeddings', 'vec_id', 'embedding', 64, 5)
      // → (query_id, neighbor_id, cos, rank). Lazy like minhash_pairs:
      // no jobs until the query executes.
      (new FunctionIdentifier("knn_join"),
        new ExpressionInfo("newspipe.NewspipeExtensions", "knn_join"),
        (children: Seq[Expression]) => {
          require(children.length == 5,
            "knn_join(table, id_col, vec_col, dim, k) takes 5 arguments")
          val names = children.take(3).map(stringArg("knn_join", _))
          val dim = longArg("knn_join", children(3)).intValue()
          val k = longArg("knn_join", children(4)).intValue()
          require(dim > 0 && k > 0, s"knn_join dim/k must be positive, got $dim/$k")
          val spark = SparkSession.active
          NewspipeSqlBridge.logicalPlan(newspipe.ops.Similarity.knnJoin(
            spark.table(names(0)), names(1), names(2), dim, k, eager = false))
        }),
      // per-doc TF-IDF keyword profiles in FROM position:
      //   SELECT * FROM tfidf('docs', 'doc_id', 'text', 3)
      // → (doc_id, token, tf, df, tfidf, rank). Lazy: pure DataFrame plan.
      (new FunctionIdentifier("tfidf"),
        new ExpressionInfo("newspipe.NewspipeExtensions", "tfidf"),
        (children: Seq[Expression]) => {
          require(children.length == 4,
            "tfidf(table, id_col, text_col, k) takes 4 arguments")
          val names = children.take(3).map(stringArg("tfidf", _))
          val k = longArg("tfidf", children(3)).intValue()
          require(k > 0, s"tfidf k must be positive, got $k")
          val spark = SparkSession.active
          NewspipeSqlBridge.logicalPlan(newspipe.ops.Retrieval.tfIdf(
            spark.table(names(0)), names(1), names(2), k))
        }),
      // DSIR importance selection in FROM position:
      //   SELECT * FROM dsir_select('wiki_docs', 'raw_docs', 'doc_id',
      //                             'text', 100, 1024)
      // → (doc_id, log_weight, rank), the n most target-like raw docs.
      // Lazy: the ratio model, scoring and Gumbel top-n are one plan.
      (new FunctionIdentifier("dsir_select"),
        new ExpressionInfo("newspipe.NewspipeExtensions", "dsir_select"),
        (children: Seq[Expression]) => {
          require(children.length == 6,
            "dsir_select(target_table, raw_table, id_col, text_col, n, " +
              "buckets) takes 6 arguments")
          val names = children.take(4).map(stringArg("dsir_select", _))
          val n = longArg("dsir_select", children(4)).intValue()
          val buckets = longArg("dsir_select", children(5)).intValue()
          require(n > 0, s"dsir_select n must be positive, got $n")
          val spark = SparkSession.active
          NewspipeSqlBridge.logicalPlan(newspipe.ops.Dsir.select(
            spark.table(names(0)), spark.table(names(1)), names(2),
            names(3), n, buckets))
        }),
      // exact substring-span dedup in FROM position:
      //   SELECT * FROM substring_scrub('docs', 'doc_id', 'text', 8)
      // → input columns + (scrub_text, n_kept): cross-document duplicated
      // k-token spans removed, canonical occurrence kept
      // ([[newspipe.ops.SubstringDedup]]). Lazy: pure DataFrame plan.
      (new FunctionIdentifier("substring_scrub"),
        new ExpressionInfo("newspipe.NewspipeExtensions", "substring_scrub"),
        (children: Seq[Expression]) => {
          require(children.length == 4,
            "substring_scrub(table, id_col, text_col, k) takes 4 arguments")
          val names = children.take(3).map(stringArg("substring_scrub", _))
          val k = longArg("substring_scrub", children(3)).intValue()
          val spark = SparkSession.active
          NewspipeSqlBridge.logicalPlan(
            newspipe.ops.SubstringDedup.scrubDuplicateSpans(
              spark.table(names(0)), names(1), names(2), k))
        }))

  /** Register on a live session (the extensions hook only applies at session
    * creation).
    */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      NewspipeSqlBridge.registerFunction(spark, ident, info, builder)
    }
    tableFunctions.foreach { case (ident, info, builder) =>
      NewspipeSqlBridge.registerTableFunction(spark, ident, info, builder)
    }
  }
}
