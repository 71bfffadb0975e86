package newspipe.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and encoding (Sennrich et al.
  * 2016) — the vocabulary a training-data pipeline ultimately feeds.
  *
  * The split between cluster and driver mirrors how production tokenizer
  * trainers actually scale: the CORPUS pass is a distributed word-frequency
  * aggregate (map-side combined — only distinct words cross the wire), and
  * merge training then runs on the weighted VOCABULARY, which is bounded
  * (`maxWords`) and orders of magnitude smaller than the corpus — at 100 TB
  * the corpus has ~10¹¹ tokens but ~10⁷ distinct words, and BPE statistics
  * are a pure function of the (word, count) table. Training on a bounded
  * collect of that table is the standard architecture (corpus-linear work
  * distributed, vocab-linear work local), not a driver-loop shortcut.
  *
  * Everything is deterministic: greedy max-count merges with
  * lexicographic (left, right) tie-breaks, so two runs — or two engines —
  * produce identical merge tables.
  */
object Bpe {

  /** One learned merge: adjacent symbol pair → concatenation, in rank
    * order (rank 0 = first/most frequent merge).
    */
  final case class Merge(left: String, right: String, rank: Int)

  /** End-of-word marker, appended as a distinct trailing symbol so merges
    * can distinguish word-final from word-internal contexts (the standard
    * Sennrich formulation).
    */
  val EndOfWord = "</w>"

  /** Distributed (word, count) aggregation over the house tokenizer —
    * the corpus-linear step. `maxWords` caps the result at the most
    * frequent words (deterministic count-desc, word-asc order) so the
    * downstream collect is bounded by construction; rare-tail truncation
    * is the same approximation every practical trainer makes.
    */
  def wordCounts(corpus: DataFrame, textCol: String,
      maxWords: Int = 65536): DataFrame = {
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    Par.ensure(corpus.select(col(textCol).as("__t")))
      .select(explode(Dedup.tokens(col("__t"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(maxWords)
  }

  /** Train `numMerges` BPE merges from a (word, count) table. The table is
    * collected (bounded: `wordCounts` caps it) and trained locally —
    * vocab-linear, corpus-independent. Deterministic: ties on pair count
    * break lexicographically.
    */
  def train(wordCounts: DataFrame, numMerges: Int): Seq[Merge] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val vocab: Array[(Array[String], Long)] = wordCounts
      .select(col("word").cast("string"), col("cnt").cast("long"))
      .collect()
      .filter(r => !r.isNullAt(0) && r.getString(0).nonEmpty)
      .map(r => (r.getString(0).map(_.toString).toArray :+ EndOfWord,
        r.getLong(1)))
    trainLocal(vocab, numMerges)
  }

  /** The local trainer on an in-memory weighted vocabulary (exposed for
    * spec-level parity against hand-computed merges).
    */
  def trainLocal(vocab: Array[(Array[String], Long)],
      numMerges: Int): Seq[Merge] = {
    var words = vocab
    val merges = Vector.newBuilder[Merge]
    var rank = 0
    while (rank < numMerges) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + cnt)
          i += 1
        }
      }
      if (pairCounts.isEmpty) return merges.result()
      // max count, then lexicographic (left, right): total order ⇒
      // deterministic merge table
      val ((l, r), best) = pairCounts.minBy { case ((a, b), c) =>
        (-c, a, b)
      }
      if (best < 1) return merges.result()
      merges += Merge(l, r, rank)
      words = words.map { case (syms, cnt) =>
        (mergePair(syms, l, r), cnt)
      }
      rank += 1
    }
    merges.result()
  }

  private def mergePair(syms: Array[String], l: String,
      r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Encode one word (without marker) under a trained merge list: start
    * from characters + [[EndOfWord]], repeatedly apply the LOWEST-rank
    * applicable merge (the standard greedy BPE encode — priority by
    * training order, not position).
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    if (word.isEmpty) return Seq(EndOfWord)
    var syms = word.map(_.toString).toArray :+ EndOfWord
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { rk =>
          if (rk < bestRank) { bestRank = rk; bestIdx = i }
        }
        i += 1
      }
      if (bestIdx < 0) done = true
      else syms = mergePair(syms, syms(bestIdx), syms(bestIdx + 1))
    }
    syms.toSeq
  }

  /** Column encoder: text → array of BPE tokens, merges broadcast to the
    * executors (the table is `numMerges` rows — trivially broadcastable;
    * the closure serializes it once per executor, not per row). Encoding
    * is per-row embarrassingly parallel — zero shuffles.
    */
  def encode(merges: Seq[Merge]): Column => Column = {
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val f = udf { text: String =>
      if (text == null) null
      else text.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9']+").toSeq
        .filter(_.nonEmpty)
        .flatMap(w => encodeWord(w, ranks))
    }
    (text: Column) => f(text)
  }

  /** Per-doc BPE token count under a trained merge table — the budget
    * column sequence packing and length filters consume.
    */
  def tokenCount(merges: Seq[Merge]): Column => Column = {
    val enc = encode(merges)
    (text: Column) => coalesce(size(enc(text)), lit(0))
  }
}
