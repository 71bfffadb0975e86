package newspipe.ops

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** Product quantization: codebook training, byte encoding, ADC search —
  * determinism, codegen=kernel parity, compression contract, and
  * planted-twin rank-1 through `adcTopK`.
  */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 16

  /** Deterministic pseudo-random unit-ish vectors. */
  private def vec(id: Long): Array[Float] = {
    val rnd = new scala.util.Random(id * 2654435761L)
    Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
  }

  private def corpusDf(n: Int) =
    (0 until n).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  test("train is deterministic and shaped m x k x dsub") {
    val df = corpusDf(200)
    val a = Pq.train(df, "embedding", dim, m = 4, k = 16, iters = 5)
    val b = Pq.train(df, "embedding", dim, m = 4, k = 16, iters = 5)
    a.flat shouldBe b.flat
    a.m shouldBe 4
    a.k shouldBe 16
    a.dsub shouldBe 4
    a.flat.length shouldBe 4 * 16 * 4
  }

  test("encode emits m bytes; identical vectors get identical codes") {
    val df = corpusDf(100)
    val cb = Pq.train(df, "embedding", dim, m = 4, k = 16, iters = 5)
    val twin = df.filter(col("vec_id") === 7)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val codes = Pq.encodeCorpus(df.union(twin), "embedding", cb)
      .select("vec_id", "pq_code").as[(Long, Array[Byte])].collect().toMap
    codes.values.foreach(_.length shouldBe 4)
    codes(1007L) shouldBe codes(7L)
    // codes discriminate: not all equal
    codes.values.map(_.toSeq).toSet.size should be > 1
  }

  test("expression codegen agrees with the kernel (encode, lut, adc)") {
    val df = corpusDf(50)
    val cb = Pq.train(df, "embedding", dim, m = 4, k = 16, iters = 5)
    val rows = Pq.encodeCorpus(df, "embedding", cb)
      .withColumn("lut", Pq.lut(col("embedding"), cb))
      .withColumn("self_adc", Pq.adcDot(col("lut"), col("pq_code"), cb))
      .select("vec_id", "embedding", "pq_code", "lut", "self_adc")
      .as[(Long, Array[Float], Array[Byte], Array[Float], Float)]
      .collect()
    rows.foreach { case (id, v, code, lutArr, selfAdc) =>
      val wrapped = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v)
      val kCode = PqKernel.encode(cb.flat, cb.m, cb.k, cb.dsub, wrapped)
      code shouldBe kCode
      val kLut = PqKernel.lut(cb.flat, cb.m, cb.k, cb.dsub, wrapped)
      lutArr shouldBe kLut.toFloatArray()
      selfAdc shouldBe PqKernel.adcDot(kLut, cb.k, kCode)
    }
  }

  test("self-ADC approximates the true squared norm (reconstruction sanity)") {
    val df = corpusDf(300)
    val cb = Pq.train(df, "embedding", dim, m = 8, k = 64, iters = 8)
    val checked = Pq.encodeCorpus(df, "embedding", cb)
      .withColumn("lut", Pq.lut(col("embedding"), cb))
      .withColumn("self_adc", Pq.adcDot(col("lut"), col("pq_code"), cb))
      .withColumn("norm2",
        aggregate(transform(col("embedding"), x => x * x),
          lit(0f), (acc, x) => acc + x))
      .select("self_adc", "norm2").as[(Float, Float)].collect()
    // dot(q, recon(q)) within 25% of |q|^2 on average — loose, but fails
    // loudly if training or the LUT indexing is broken
    val relErr = checked.map { case (adc, n2) =>
      math.abs(adc.toDouble - n2) / n2 }
    (relErr.sum / relErr.length) should be < 0.25
  }

  test("null vector encodes to null, null code scores null") {
    val df = Seq((1L, vec(1)), (2L, null))
      .toDF("vec_id", "embedding")
    val cb = Pq.train(corpusDf(100), "embedding", dim, m = 4, k = 16, iters = 3)
    val out = Pq.encodeCorpus(df, "embedding", cb)
      .select("vec_id", "pq_code").as[(Long, Array[Byte])].collect().toMap
    out(2L) shouldBe null
  }

  test("adcTopK: planted twin wins rank 1 for every query") {
    val base = corpusDf(400)
    val queries = base.filter(col("vec_id") < 8)
    val planted = queries.select((col("vec_id") + 100000).as("vec_id"),
      col("embedding"))
    val corpus = base.union(planted)
    val cb = Pq.train(corpus, "embedding", dim, m = 8, k = 64, iters = 8)
    val encoded = Pq.encodeCorpus(corpus, "embedding", cb)
    val top = Pq.adcTopK(queries, encoded, "vec_id", "embedding",
        "pq_code", cb, k = 3)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 8L).foreach(q => top(q) shouldBe q + 100000)
  }

  test("ivfPqTopK: cells bound candidates, ADC ranks — twin still wins rank 1") {
    val base = corpusDf(400)
    val queries = base.filter(col("vec_id") < 8)
    val planted = queries.select((col("vec_id") + 100000).as("vec_id"),
      col("embedding"))
    val corpus = base.union(planted)
    val cb = Pq.train(corpus, "embedding", dim, m = 8, k = 64, iters = 8)
    val top = Pq.ivfPqTopK(queries, corpus, "vec_id", "embedding", cb,
        k = 3, nlist = 8, nprobe = 3)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    // an identical vector lands in the identical nearest cell, which is
    // the query's first probe — reachable by construction, and its
    // byte-identical code maximizes ADC
    (0L until 8L).foreach(q => top(q) shouldBe q + 100000)
  }

  test("k=256 codes round-trip through the signed-byte boundary") {
    // force centroid ids > 127: k=256 with >=256 distinct training points
    val df = corpusDf(600)
    val cb = Pq.train(df, "embedding", dim, m = 2, k = 256, iters = 3)
    val codes = Pq.encodeCorpus(df, "embedding", cb)
      .select("pq_code").as[Array[Byte]].collect()
    // some code byte must land in the negative (unsigned >127) range,
    // and ADC must still index it correctly (no exception, finite result)
    assert(codes.exists(_.exists(_ < 0)), "no centroid id above 127 — " +
      "the signed-byte path is untested")
    val adc = Pq.encodeCorpus(df, "embedding", cb)
      .withColumn("lut", Pq.lut(col("embedding"), cb))
      .withColumn("d", Pq.adcDot(col("lut"), col("pq_code"), cb))
      .select("d").as[Float].collect()
    adc.foreach(d => assert(!d.isNaN && !d.isInfinite))
  }

  test("dim not divisible by m is refused") {
    val df = corpusDf(10)
    an[IllegalArgumentException] should be thrownBy
      Pq.train(df, "embedding", dim, m = 5)
  }
}
