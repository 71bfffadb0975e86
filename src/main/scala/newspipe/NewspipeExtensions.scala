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
  override def apply(ext: SparkSessionExtensions): Unit =
    NewspipeExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
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
      })) ++ {
      import newspipe.functions.{SentimentAnalyzer, TextFunctions}
      import newspipe.ops.{Dedup, TextStats}
      Seq(
        fn1("html_strip")(TextFunctions.removeHtmlTags),
        fn1("extract_domain")(TextFunctions.extractDomain),
        fn1("sentiment")(SentimentAnalyzer.sentiment),
        fn1("word_count")(TextStats.wordCount),
        fn1("bpeish_token_count")(TextStats.bpeishTokenCount),
        fn1("punct_ratio")(TextStats.punctRatio),
        fn1("stopword_ratio")(TextStats.stopwordRatio(_)),
        fn1("avg_word_len")(TextStats.avgWordLen),
        fn1("quality_score")(TextStats.qualityScore),
        fn1("dup_token_ratio")(TextStats.duplicateTokenRatio),
        fn1("top_bigram_fraction")(TextStats.topBigramFraction),
        fn1("redact_pii")(TextStats.redactPii(_)),
        fn1("pii_match_count")(TextStats.piiMatchCount),
        fn1("lang_id")(TextStats.langId),
        fn1("normalized_fingerprint")(TextStats.normalizedFingerprint),
        fn1("rolling_fingerprint")(TextStats.rollingFingerprint),
        fn1("simhash")(Dedup.simhash))
    }

  /** Register on a live session (the extensions hook only applies at session
    * creation).
    */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      NewspipeSqlBridge.registerFunction(spark, ident, info, builder)
    }
}
