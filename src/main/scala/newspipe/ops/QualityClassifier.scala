package newspipe.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A trainable quality classifier INSIDE the engine — the fastText-style
  * linear model data pipelines use to score "looks like the target
  * distribution" at corpus scale (GPT-3/LLaMA-style quality filtering:
  * train a cheap classifier on a small positive set, score everything,
  * keep the high end). Logistic regression over hashed bag-of-token
  * features, trained with FULL-BATCH gradient descent where each epoch is
  * one `treeAggregate` over the corpus:
  *
  *  - feature space is `buckets` hashed unigram counts (the [[Dsir]]
  *    md5 hash — engine-replayable featurization, no vocabulary state);
  *  - the gradient of the whole corpus reduces map-side per partition and
  *    merges log-depth, so an epoch costs one pass and ships ONE
  *    `buckets`-length vector to the driver — no parameter server, no
  *    per-row shuffle;
  *  - full-batch (not SGD) is deliberate: the gradient is a pure
  *    SUM over rows, so training is deterministic up to float-add order
  *    regardless of partitioning — the same reproducibility contract as
  *    the rest of the engine (SGD's sequential updates would depend on
  *    row order);
  *  - scoring is a broadcast dot product per row — embarrassingly
  *    parallel, zero shuffles, usable inside any downstream gate.
  *
  * Weights live on the driver between epochs (`buckets + 1` doubles —
  * KBs; the corpus never does).
  */
object QualityClassifier {

  /** Trained model: `weights(buckets)` is the bias term. `binary` records
    * the featurization the model was trained under (presence vs counts) so
    * scoring can never disagree with training.
    */
  final case class Model(weights: Array[Double], buckets: Int,
      binary: Boolean) {
    require(weights.length == buckets + 1, "weights must be buckets + 1 (bias)")
  }

  private def sigmoid(z: Double): Double =
    if (z >= 0) 1.0 / (1.0 + math.exp(-z))
    else { val e = math.exp(z); e / (1.0 + e) }

  // One digest per thread, not per token — the scoring path hashes every
  // token of every row (same pattern as TextKernels.WinnowKernel).
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Hashed feature counts of one text (driver/executor-shared scalar
    * kernel; tokenization mirrors [[Dedup.tokens]]).
    */
  private def featurize(text: String, buckets: Int,
      binary: Boolean): Array[(Int, Double)] = {
    if (text == null) return Array.empty
    val counts = new java.util.HashMap[Int, Double]()
    val md = md5.get()
    // Locale.ROOT: the house tokenizer (TextKernels via UTF8String) is
    // locale-independent; default-locale toLowerCase diverges on tr_TR.
    text.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9']+").foreach { tok =>
      if (tok.nonEmpty) {
        md.reset()
        val h = md.digest(tok.getBytes("UTF-8"))
        val b32 = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
          ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
        val b = (b32 % buckets).toInt
        if (binary) counts.put(b, 1.0)
        else counts.merge(b, 1.0, (a, x) => a + x)
      }
    }
    val out = new Array[(Int, Double)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); out(i) = (e.getKey, e.getValue); i += 1 }
    out
  }

  /** Train on `(textCol, labelCol)` — label 1.0 = target-quality, 0.0 =
    * not. One treeAggregate per epoch; `l2` regularizes everything but the
    * bias. Rows with null text contribute only through the bias.
    */
  def train(df: DataFrame, textCol: String, labelCol: String,
      buckets: Int = 4096, epochs: Int = 30, lr: Double = 0.5,
      l2: Double = 1e-4, binaryFeatures: Boolean = false): Model = {
    require(buckets >= 2 && epochs >= 1 && lr > 0 && l2 >= 0,
      "need buckets >= 2, epochs >= 1, lr > 0, l2 >= 0")
    val rows = Par.ensure(df.select(
        col(textCol).cast("string").as("__t"),
        col(labelCol).cast("double").as("__y")))
      .filter(col("__y").isNotNull)
    // featurize ONCE and persist the (sparse features, label) pairs —
    // tokenize+md5 dominates a pass, and every epoch re-reads the same
    // features; the persisted form is the sparse vectors, not the text
    val rdd = rows.rdd
      .map(r => (featurize(r.getString(0), buckets, binaryFeatures),
        r.getDouble(1)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = rdd.count().toDouble
    require(n > 0, "training corpus is empty")
    var w = new Array[Double](buckets + 1)
    for (_ <- 1 to epochs) {
      val wB = rdd.sparkContext.broadcast(w)
      val grad = rdd.treeAggregate(new Array[Double](buckets + 1))(
        (g, row) => {
          val (feats, y) = row
          var z = wB.value(buckets)
          feats.foreach { case (b, c) => z += wB.value(b) * c }
          val err = sigmoid(z) - y
          feats.foreach { case (b, c) => g(b) += err * c }
          g(buckets) += err
          g
        },
        (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a },
        depth = 2)
      val next = new Array[Double](buckets + 1)
      var i = 0
      while (i < buckets) {
        next(i) = w(i) - lr * (grad(i) / n + l2 * w(i))
        i += 1
      }
      next(buckets) = w(buckets) - lr * grad(buckets) / n
      w = next
      wB.destroy()
    }
    rdd.unpersist(blocking = false)
    Model(w, buckets, binaryFeatures)
  }

  /** Probability-of-target column under a trained model: broadcast dot
    * product per row, no shuffle — composes with any downstream gate
    * (`score(...) >= 0.9` as a [[Sampling]]-style filter).
    */
  def score(model: Model): Column => Column = {
    val w = model.weights
    val buckets = model.buckets
    val binary = model.binary
    val f = udf { text: String =>
      var z = w(buckets)
      featurize(text, buckets, binary).foreach { case (b, c) => z += w(b) * c }
      sigmoid(z)
    }
    (text: Column) => f(text)
  }
}
