package newspipe.functions

import newspipe.model.Sentiment
import org.apache.spark.sql.{Column, NewspipeSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Lexicon-based sentiment scorer — the Scala replacement for the reference's
  * `analyze_sentiment` Python UDF (_lib_dq_helpers.py:84-95), which calls
  * TextBlob's PatternAnalyzer and maps sign(polarity) → positive/negative/neutral.
  *
  * This reimplements the published shape of that algorithm (per-token lexicon
  * polarity, intensifier boosting, negation flipping, average over matched
  * tokens) over an embedded lexicon authored from common English sentiment
  * vocabulary. Exact float parity with TextBlob is explicitly out of scope
  * (SURVEY.md §2.9 X2) and UNVERIFIABLE in this environment: neither the
  * textblob/pattern libraries nor their en-sentiment.xml lexicon exist in
  * the zero-egress image, so a "float-parity mode" could never be asserted
  * against the real thing. The correctness bar is LABEL parity on clearly
  * positive/negative/neutral text plus null-safety: null → (null, null),
  * no lexicon hit → polarity 0.0 → "neutral".
  *
  * Execution: a native Catalyst expression ([[SentimentScore]]) whose
  * codegen emits one static kernel call inside whole-stage codegen — no
  * ScalaUDF encoder round-trip, no codegen barrier in the silver hot path.
  * The kernel delegates to the SAME [[score]] scalar as the legacy UDF
  * (kept for parity testing), so the two paths are float-identical by
  * construction; CodegenParitySpec pins codegen = interpreted = UDF.
  */
object SentimentAnalyzer extends Serializable {

  /** word → polarity in [-1, 1]. Modeled on the entries of TextBlob's public
    * en-sentiment.xml lexicon (word polarities rounded to one decimal).
    */
  val Lexicon: Map[String, Double] = Map(
    // positive
    "good" -> 0.7, "great" -> 0.8, "excellent" -> 1.0, "amazing" -> 0.6,
    "awesome" -> 1.0, "fantastic" -> 0.4, "wonderful" -> 1.0, "best" -> 1.0,
    "better" -> 0.5, "happy" -> 0.8, "love" -> 0.5, "loved" -> 0.7,
    "nice" -> 0.6, "superb" -> 0.9, "brilliant" -> 0.9, "positive" -> 0.2,
    "success" -> 0.5, "successful" -> 0.8, "win" -> 0.4, "winning" -> 0.5,
    "strong" -> 0.4, "beautiful" -> 0.9, "perfect" -> 1.0, "impressive" -> 1.0,
    "outstanding" -> 0.9, "remarkable" -> 0.8, "delightful" -> 0.9,
    "favorable" -> 0.6, "gain" -> 0.4, "gains" -> 0.4, "boost" -> 0.4,
    "improve" -> 0.4, "improved" -> 0.5, "improvement" -> 0.4, "thrive" -> 0.6,
    "record" -> 0.2, "surge" -> 0.3, "rally" -> 0.3, "optimistic" -> 0.5,
    "promising" -> 0.6, "safe" -> 0.5, "calm" -> 0.3, "clean" -> 0.4,
    "fresh" -> 0.3, "innovative" -> 0.5, "efficient" -> 0.5, "reliable" -> 0.5,
    "smart" -> 0.6, "helpful" -> 0.6, "easy" -> 0.4, "fun" -> 0.3,
    "exciting" -> 0.4, "hope" -> 0.2, "hopeful" -> 0.5, "celebrate" -> 0.6,
    "victory" -> 0.6, "triumph" -> 0.7, "praise" -> 0.5, "praised" -> 0.5,
    // negative
    "bad" -> -0.7, "terrible" -> -1.0, "awful" -> -1.0, "horrible" -> -1.0,
    "worst" -> -1.0, "worse" -> -0.5, "sad" -> -0.5, "unhappy" -> -0.6,
    "hate" -> -0.8, "hated" -> -0.9, "poor" -> -0.4, "negative" -> -0.3,
    "fail" -> -0.5, "failed" -> -0.6, "failure" -> -0.6, "lose" -> -0.3,
    "loss" -> -0.4, "losses" -> -0.4, "losing" -> -0.4, "weak" -> -0.4,
    "ugly" -> -0.7, "broken" -> -0.4, "crisis" -> -0.6, "disaster" -> -0.8,
    "disastrous" -> -0.9, "dangerous" -> -0.6, "danger" -> -0.5,
    "threat" -> -0.5, "fear" -> -0.4, "fears" -> -0.4, "panic" -> -0.6,
    "crash" -> -0.6, "collapse" -> -0.6, "decline" -> -0.3, "drop" -> -0.2,
    "plunge" -> -0.5, "slump" -> -0.5, "scandal" -> -0.7, "fraud" -> -0.8,
    "corrupt" -> -0.8, "corruption" -> -0.8, "violence" -> -0.7,
    "violent" -> -0.7, "war" -> -0.6, "death" -> -0.6, "dead" -> -0.6,
    "kill" -> -0.7, "killed" -> -0.7, "attack" -> -0.5, "attacks" -> -0.5,
    "wrong" -> -0.5, "problem" -> -0.3, "problems" -> -0.3, "risk" -> -0.3,
    "risky" -> -0.4, "painful" -> -0.7, "angry" -> -0.5, "dirty" -> -0.6,
    "toxic" -> -0.7, "slow" -> -0.3, "boring" -> -0.8, "disappointing" -> -0.6,
    "disappointed" -> -0.75, "annoying" -> -0.6, "useless" -> -0.5
  )

  /** intensifier → multiplier applied to the NEXT lexicon hit
    * (TextBlob's "intensity" modifiers).
    */
  val Intensifiers: Map[String, Double] = Map(
    "very" -> 1.3, "really" -> 1.3, "extremely" -> 1.5, "incredibly" -> 1.5,
    "highly" -> 1.3, "truly" -> 1.3, "so" -> 1.2, "quite" -> 1.1,
    "slightly" -> 0.8, "somewhat" -> 0.8, "barely" -> 0.7, "hardly" -> 0.7
  )

  /** negators: a negator within the two tokens before a lexicon hit flips and
    * damps its polarity by -0.5 (TextBlob's negation rule).
    */
  val Negators: Set[String] = Set("not", "no", "never", "cannot", "isnt",
    "isn't", "dont", "don't", "doesnt", "doesn't", "wasnt", "wasn't", "wont",
    "won't", "didnt", "didn't")

  private val TokenRe = "[a-z']+".r

  /** Pure scorer: average modified polarity over lexicon-matched tokens.
    * No match → 0.0 (TextBlob returns 0.0 for unmatched text, which the
    * reference labels "neutral"). null → Sentiment(None, None) (ref _lib:85-86).
    */
  def score(text: String): Sentiment = {
    if (text == null) return Sentiment(None, None)
    val tokens = TokenRe.findAllIn(text.toLowerCase(java.util.Locale.ROOT)).toArray
    var sum = 0.0
    var n = 0
    var i = 0
    while (i < tokens.length) {
      Lexicon.get(tokens(i)) match {
        case Some(p0) =>
          var p = p0
          if (i > 0) Intensifiers.get(tokens(i - 1)).foreach(m => p = p * m)
          val negated = (i > 0 && Negators(tokens(i - 1))) ||
            (i > 1 && Negators(tokens(i - 2)))
          if (negated) p = p * -0.5
          sum += math.max(-1.0, math.min(1.0, p))
          n += 1
        case None =>
      }
      i += 1
    }
    val polarity = if (n == 0) 0.0 else sum / n
    Sentiment(Some(polarity.toFloat), Some(label(polarity)))
  }

  /** sign → label, exactly the reference's mapping (_lib:88-94). */
  def label(polarity: Double): String =
    if (polarity > 0) "positive" else if (polarity < 0) "negative" else "neutral"

  /** Legacy UDF form, retained as the parity baseline for
    * [[SentimentScore]] (CodegenParitySpec asserts the native expression
    * equals this bit for bit).
    */
  val sentimentUdf = udf((s: String) => score(s))

  /** STRUCT<polarity FLOAT, label STRING> — same shape the reference
    * registers at 02:21-24, produced by the native codegen'd expression.
    *
    * `textblobParity = true` switches to [[PatternSentiment]] — the faithful
    * port of TextBlob/pattern's published assessment arithmetic over an
    * en-sentiment.xml-format lexicon (drop-in real lexicon → exact float
    * parity with the reference's `analyze_sentiment`). Default mode (and its
    * q20 hashes) is unchanged.
    */
  def sentiment(c: Column, textblobParity: Boolean = false): Column =
    if (textblobParity) PatternSentiment.sentiment(c)
    else NewspipeSqlBridge.column(SentimentScore(NewspipeSqlBridge.expression(c)))
}

/** Static sentiment kernel: one call per row, returning the struct as an
  * InternalRow. Delegates to [[SentimentAnalyzer.score]] so the native
  * expression and the legacy UDF cannot drift. A null/None field maps to a
  * null struct field — the struct itself is never null (ref _lib:85-86:
  * null text still yields a row with null polarity/label).
  */
object SentimentKernel {
  def score(text: UTF8String): InternalRow = {
    val s = SentimentAnalyzer.score(if (text == null) null else text.toString)
    new GenericInternalRow(Array[Any](
      s.polarity.map(Float.box).orNull,
      s.label.map(UTF8String.fromString).orNull))
  }
}

/** Sentiment as a native expression (codegen'd static kernel call). NOT
  * null-propagating: null text → struct(null, null), the exact value the
  * UDF encoder produced for Sentiment(None, None).
  */
case class SentimentScore(child: Expression)
    extends UnaryExpression with Serializable {
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._
  import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral

  override def dataType: DataType = StructType(Seq(
    StructField("polarity", FloatType, nullable = true),
    StructField("label", StringType, nullable = true)))
  override def nullable: Boolean = false
  override def prettyName: String = "sentiment"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    SentimentKernel.score(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val tpe = "org.apache.spark.sql.catalyst.InternalRow"
    ev.copy(code = code"""
      ${c.code}
      $tpe ${ev.value} = newspipe.functions.SentimentKernel.score(
        ${c.isNull} ? null : ${c.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SentimentScore =
    copy(child = newChild)
}
