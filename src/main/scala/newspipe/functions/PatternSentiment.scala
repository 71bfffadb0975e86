package newspipe.functions

import newspipe.model.Sentiment
import org.apache.spark.sql.{Column, NewspipeSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, InputStream}
import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer

/** TextBlob float-parity sentiment mode (SURVEY §2.9 X2, ref
  * `_lib_dq_helpers.py:84-95`).
  *
  * The reference calls `TextBlob(text).sentiment.polarity`, which is the
  * pattern library's lexicon scorer (`pattern.text.Sentiment`, vendored as
  * `textblob/_text.py` — public BSD code). This object ports that PUBLISHED
  * arithmetic exactly:
  *
  *   - lexicon entries `(polarity, subjectivity, intensity)` per (form, POS),
  *     averaged across senses per POS and then across POS tags (string input
  *     is scored with POS = unknown, i.e. the across-POS average);
  *   - a preceding modifier adverb ("really good") MERGES into the previous
  *     assessment: `p' = clamp(p * i_prev)`, and the pair carries the new
  *     word's intensity;
  *   - a preceding negation ("not good") inverts the intensity
  *     (`i' = 1 / i`) and marks the assessment, which is finally scored as
  *     `p * -0.5` — so "not really good" = `-(p_good / i_really) * 0.5`;
  *   - negation survives across 1-letter tokens ("not a good idea") and can
  *     FOLLOW a modifier ("really not good" marks the modifier's assessment);
  *   - non-alphabetic short tokens are checked against the emoticon table;
  *   - final polarity = unweighted mean over assessments, 0.0 when none.
  *
  * The lexicon is loaded from a file in the PUBLIC `en-sentiment.xml` format
  * (`<word form=.. pos=.. polarity=.. subjectivity=.. intensity=.. />`), so
  * the real TextBlob lexicon is a drop-in replacement for exact float parity.
  * The bundled resource (`newspipe/en-sentiment.xml`) mirrors
  * [[SentimentAnalyzer.Lexicon]]'s vocabulary (the real file cannot ship in a
  * zero-egress build). Tokenization is a documented approximation of
  * pattern's `find_tokens`: contraction suffixes split off ("isn't" →
  * "is n't" — "n't" IS a negation token), edge punctuation peeled into its
  * own tokens; abbreviation protection is not reproduced.
  *
  * This mode is opt-in (`SentimentAnalyzer.sentiment(c, textblobParity =
  * true)` / [[PatternSentiment.sentiment]]); the default mode and its q20
  * hashes are unchanged.
  */
object PatternSentiment extends Serializable {

  /** Per-word score: (polarity, subjectivity, intensity). */
  final case class Psi(p: Double, s: Double, i: Double)

  /** Lexicon with the pattern semantics: `words` is the across-POS average
    * used for untagged input; `modifiers` are forms that carry an RB (adverb)
    * reading — only those chain into the next assessment.
    */
  final class Lexicon(
      val words: Map[String, Psi],
      val modifiers: Set[String],
      val negations: Set[String]) extends Serializable

  object Lexicon {
    val DefaultNegations: Set[String] = Set("no", "not", "n't", "never")

    /** Parse a lexicon file in the public en-sentiment.xml format. Averaging
      * matches pattern's loader: mean(p,s,i) across senses per (form, pos),
      * then mean across POS tags per form.
      */
    def fromXml(in: InputStream): Lexicon = {
      val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      val doc = dbf.newDocumentBuilder().parse(in)
      val nodes = doc.getElementsByTagName("word")
      // (form, pos) -> senses
      val senses = scala.collection.mutable.LinkedHashMap.empty[(String, String), ArrayBuffer[Psi]]
      var k = 0
      while (k < nodes.getLength) {
        val e = nodes.item(k).asInstanceOf[org.w3c.dom.Element]
        def attr(n: String, d: Double): Double = {
          val v = e.getAttribute(n); if (v == null || v.isEmpty) d else v.toDouble
        }
        val form = e.getAttribute("form").toLowerCase(java.util.Locale.ROOT)
        val pos = e.getAttribute("pos")
        if (form.nonEmpty)
          senses.getOrElseUpdate((form, pos), ArrayBuffer.empty) +=
            Psi(attr("polarity", 0.0), attr("subjectivity", 0.0), attr("intensity", 1.0))
        k += 1
      }
      def mean(xs: scala.collection.Seq[Double]): Double = xs.sum / xs.size
      val perPos = senses.toSeq.map { case ((form, pos), ss) =>
        (form, pos, Psi(mean(ss.map(_.p)), mean(ss.map(_.s)), mean(ss.map(_.i))))
      }
      val byForm = perPos.groupBy(_._1)
      val words = byForm.map { case (form, entries) =>
        val ps = entries.map(_._3)
        form -> Psi(mean(ps.map(_.p)), mean(ps.map(_.s)), mean(ps.map(_.i)))
      }
      val modifiers = byForm.collect { case (form, entries) if entries.exists(_._2 == "RB") => form }.toSet
      new Lexicon(words, modifiers, DefaultNegations)
    }

    def fromXmlString(xml: String): Lexicon =
      fromXml(new ByteArrayInputStream(xml.getBytes(StandardCharsets.UTF_8)))

    /** The bundled resource lexicon (SentimentAnalyzer vocabulary in the
      * public file format).
      */
    lazy val bundled: Lexicon = {
      val in = getClass.getResourceAsStream("/newspipe/en-sentiment.xml")
      require(in != null, "bundled lexicon resource missing: /newspipe/en-sentiment.xml")
      try fromXml(in) finally in.close()
    }
  }

  /** pattern's EMOTICONS table (sentiment per facial-expression family),
    * lowercased forms.
    */
  private val Emoticons: Map[String, Double] = {
    val families: Seq[(Double, Seq[String])] = Seq(
      1.00 -> Seq("<3", ":*", ":-*"),
      1.00 -> Seq(">:d", ":-d", ":d", "=-d", "=d", "x-d", "xd", "8-d"),
      0.50 -> Seq(">:)", ":-)", ":)", "=)", "=]", ":]", ":}", ":>", ":3", "8)", "8-)"),
      0.25 -> Seq(">;]", ";-)", ";)", ";-]", ";]", ";d", ";^)", "*-)", "*)"),
      -0.25 -> Seq(":-|", ":|"),
      -0.25 -> Seq(">:/", ":-/", ":/", ":\\", ">:\\", ":-s", ":s"),
      -0.75 -> Seq(">:p", ":-p", ":p", ":-b", ":b"),
      -0.75 -> Seq(">:[", ":-(", ":(", "=(", ":-[", ":[", ":{", ":-<", ":c", ":-c"),
      -1.00 -> Seq(":'(", ";'("))
    families.flatMap { case (p, forms) => forms.map(_ -> p) }.toMap
  }

  private val Punctuation: Set[Char] = ".,;:!?()[]{}`'\"@#$^&*+-|=~_".toSet

  /** Documented approximation of pattern's `find_tokens` for sentiment input:
    * lowercase, split contraction suffixes into their own tokens, peel edge
    * punctuation. Emoticon tokens (no letters/digits) are kept whole.
    */
  def tokenize(text: String): Array[String] = {
    val suffixes = Array("n't", "'d", "'m", "'s", "'ll", "'re", "'ve")
    val out = ArrayBuffer.empty[String]
    for (raw0 <- text.toLowerCase(java.util.Locale.ROOT).split("\\s+") if raw0.nonEmpty) {
      var w = raw0
      // keep pure-symbol tokens (emoticons / punctuation runs) intact
      if (w.exists(_.isLetterOrDigit)) {
        // peel leading punctuation
        var lead = 0
        while (lead < w.length && Punctuation(w.charAt(lead))) { out += w.charAt(lead).toString; lead += 1 }
        w = w.substring(lead)
        // peel trailing punctuation (collect, emit after word parts)
        val tail = ArrayBuffer.empty[String]
        while (w.nonEmpty && Punctuation(w.charAt(w.length - 1)) &&
            // keep a trailing apostrophe that is part of a contraction split below
            !(w.charAt(w.length - 1) == '\'' && suffixes.exists(w.endsWith))) {
          tail.prepend(w.charAt(w.length - 1).toString); w = w.dropRight(1)
        }
        if (w.nonEmpty) {
          suffixes.find(sfx => w.length > sfx.length && w.endsWith(sfx)) match {
            case Some(sfx) => out += w.dropRight(sfx.length); out += sfx
            case None => out += w
          }
        }
        out ++= tail
      } else out += w
    }
    out.toArray
  }

  /** One scored span: the words it covers, final polarity, subjectivity. */
  final case class Assessment(words: List[String], polarity: Double, subjectivity: Double)

  private def clamp(x: Double): Double = math.max(-1.0, math.min(x, 1.0))

  /** Faithful port of `Sentiment.assessments` (textblob/_text.py) for
    * untagged (POS = unknown) token streams.
    */
  def assessments(tokens: Array[String], lex: Lexicon): List[Assessment] = {
    final class A(var words: List[String], var p: Double, var s: Double, var i: Double, var neg: Boolean)
    val a = ArrayBuffer.empty[A]
    var m: String = null // preceding modifier adverb
    var n: String = null // preceding negation
    for (w <- tokens) {
      lex.words.get(w) match {
        case Some(Psi(p, s, i)) =>
          if (m == null) a += new A(List(w), p, s, i, neg = false)
          else {
            val last = a.last
            last.words = last.words :+ w
            last.p = clamp(p * last.i)
            last.s = clamp(s * last.i)
            last.i = i
          }
          if (n != null && a.nonEmpty) {
            val last = a.last
            last.words = n :: last.words
            last.i = 1.0 / last.i
            last.neg = true
          }
          m = null; n = null
          if (lex.modifiers(w)) m = w
          if (lex.negations(w)) n = w
        case None =>
          if (lex.negations(w)) n = w
          else if (n != null && w.replaceAll("^'+|'+$", "").length > 1) n = null
          if (n != null && m != null && lex.modifiers(m)) {
            // "really not good": the negation attaches to the modifier's assessment
            if (a.nonEmpty) { val last = a.last; last.words = last.words :+ n; last.neg = true }
            n = null
          } else if (!w.forall(_.isLetter) && w.length <= 5 && !(w.length == 1 && Punctuation(w.charAt(0)))) {
            Emoticons.get(w).foreach(p => a += new A(List(w), p, 1.0, 1.0, neg = false))
          }
          m = null
      }
    }
    a.map(b => Assessment(b.words, if (b.neg) b.p * -0.5 else b.p, b.s)).toList
  }

  /** (polarity, subjectivity) — unweighted means over assessments, (0,0) when
    * nothing matched (TextBlob's Score for unscored text).
    */
  def polaritySubjectivity(text: String, lex: Lexicon = Lexicon.bundled): (Double, Double) = {
    val as = assessments(tokenize(text), lex)
    if (as.isEmpty) (0.0, 0.0)
    else (as.map(_.polarity).sum / as.size, as.map(_.subjectivity).sum / as.size)
  }

  /** Same output surface as [[SentimentAnalyzer.score]]: STRUCT(polarity
    * FLOAT, label STRING) with the reference's sign → label mapping.
    */
  def score(text: String): Sentiment = {
    if (text == null) return Sentiment(None, None)
    val p = polaritySubjectivity(text)._1
    Sentiment(Some(p.toFloat), Some(SentimentAnalyzer.label(p)))
  }

  /** Column form — the parity-mode counterpart of
    * [[SentimentAnalyzer.sentiment]].
    */
  def sentiment(c: Column): Column =
    NewspipeSqlBridge.column(PatternSentimentScore(NewspipeSqlBridge.expression(c)))
}

/** Static kernel for the parity-mode expression (same struct shape as
  * [[SentimentKernel]]).
  */
object PatternSentimentKernel {
  def score(text: UTF8String): InternalRow = {
    val s = PatternSentiment.score(if (text == null) null else text.toString)
    new GenericInternalRow(Array[Any](
      s.polarity.map(Float.box).orNull,
      s.label.map(UTF8String.fromString).orNull))
  }
}

/** TextBlob-parity sentiment as a native codegen'd expression. */
case class PatternSentimentScore(child: Expression)
    extends UnaryExpression with Serializable {
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._
  import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral

  override def dataType: DataType = StructType(Seq(
    StructField("polarity", FloatType, nullable = true),
    StructField("label", StringType, nullable = true)))
  override def nullable: Boolean = false
  override def prettyName: String = "sentiment_textblob"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    PatternSentimentKernel.score(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val tpe = "org.apache.spark.sql.catalyst.InternalRow"
    ev.copy(code = code"""
      ${c.code}
      $tpe ${ev.value} = newspipe.functions.PatternSentimentKernel.score(
        ${c.isNull} ? null : ${c.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PatternSentimentScore =
    copy(child = newChild)
}
