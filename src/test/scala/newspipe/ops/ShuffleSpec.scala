package newspipe.ops

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** Extension: deterministic shuffle-sharding (reproducible training-order
  * permutation + fixed shard assignment).
  */
class ShuffleSpec extends SparkTestBase {
  import spark.implicits._

  private def ids = (1L to 2000L).toDF("id")

  test("assignment is deterministic and independent of partition layout") {
    val a = Shuffle.shuffleShard(ids, "id", 8, "s1")
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().toSet
    val b = Shuffle.shuffleShard(ids.repartition(13), "id", 8, "s1")
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().toSet
    a shouldBe b // pure function of (salt, key), not of layout
  }

  test("shards are near-balanced and positions are a 1..count permutation per shard") {
    val out = Shuffle.shuffleShard(ids, "id", 8, "s1")
      .groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        count_distinct(col("pos")).as("d"))
      .as[(Long, Long, Long, Long, Long)].collect()
    out.length shouldBe 8
    out.foreach { case (_, n, lo, hi, d) =>
      lo shouldBe 1L // positions are dense from 1
      hi shouldBe n
      d shouldBe n // and unique within the shard
      n.toDouble shouldBe (250.0 +- 100.0) // ~multinomial balance
    }
  }

  test("different salts give different permutations") {
    val a = Shuffle.shuffleShard(ids, "id", 4, "s1")
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().toSet
    val b = Shuffle.shuffleShard(ids, "id", 4, "s2")
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().toSet
    a should not be b
  }

  test("null keys are excluded; original columns survive") {
    val df = Seq((Option(1L), "a"), (Option.empty[Long], "b"), (Option(3L), "c"))
      .toDF("id", "payload")
    val out = Shuffle.shuffleShard(df, "id", 2, "s")
    out.columns.toSeq shouldBe Seq("id", "payload", "shard", "pos")
    out.select("id").as[Long].collect().sorted shouldBe Array(1L, 3L)
  }

  test("numShards=1 degenerates to one total order") {
    val out = Shuffle.shuffleShard((1L to 50L).toDF("id"), "id", 1, "s")
    out.select("shard").distinct().as[Long].collect() shouldBe Array(0L)
    out.select("pos").as[Long].collect().sorted shouldBe (1L to 50L).toArray
  }

  test("writeShards: shard=N layout, per-file rows in shuffleShard's exact order, no window") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    Shuffle.writeShards(ids, "id", 4, s"$dir/out", "ws")
    val back = spark.read.parquet(s"$dir/out")
    // same shard assignment as the row-numbered operator
    val want = Shuffle.shuffleShard(ids, "id", 4, "ws")
    back.select("id", "shard").as[(Long, Long)].collect().toSet shouldBe
      want.select("id", "shard").as[(Long, Long)].collect().toSet
    // within every written FILE, rows appear in (hex, id) order — the
    // training loader streams each shard file in permutation order without
    // any stored positions
    val perFile = back
      .withColumn("__f", input_file_name())
      .withColumn("__hex", md5(concat(lit("ws"), col("id").cast("string"))))
      .select("__f", "__hex", "id").collect()
      .groupBy(_.getString(0))
    perFile.foreach { case (_, rows) =>
      val hexes = rows.map(r => (r.getString(1), r.getLong(2))).toSeq
      hexes shouldBe hexes.sortBy(identity)
    }
    // and the write plan carried no window (the point of this path)
    val plan = ids
      .withColumn("__hex", md5(concat(lit("ws"), col("id").cast("string"))))
      .repartitionByRange(4, col("id"))
      .sortWithinPartitions("id").queryExecution.executedPlan.toString
    plan should not include "Window"
  }
}
