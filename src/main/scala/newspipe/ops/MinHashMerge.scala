package newspipe.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` merging per-document MinHash signatures into one
  * corpus-level signature (element-wise min) — SURVEY.md §2.9's extension
  * UDAF slot.
  *
  * Because min is associative+commutative, the merge distributes perfectly:
  * partial signatures combine map-side, so a whole corpus (or any groupBy
  * slice — per source, per day, per shard) reduces to `numHashes` longs with
  * one aggregation, no matter how many rows. Jaccard similarity between two
  * corpora is then estimated driver-side from signature agreement — the
  * standard MinHash estimator, O(numHashes) per comparison instead of
  * O(|A| + |B|).
  */
final class MinHashMerge(numHashes: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] with Serializable {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    if (sig != null) {
      var i = 0
      val n = math.min(buf.length, sig.length)
      while (i < n) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object MinHashMerge {
  /** Column aggregate: merge a signature column (array<bigint>) per group. */
  def mergeSignatures(sigCol: Column, numHashes: Int = 64): Column =
    udaf(new MinHashMerge(numHashes), ExpressionEncoder[Seq[Long]]()).apply(sigCol)

  /** MinHash Jaccard estimate between two merged signatures: the fraction of
    * agreeing components.
    */
  def estimatedJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    require(a.length == b.length, "signature lengths differ")
    if (a.isEmpty) 0.0
    else a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toDouble / a.length
  }
}
