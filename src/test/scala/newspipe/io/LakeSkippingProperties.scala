package newspipe.io

import newspipe.SparkTestBase
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Generative soundness property for the data-skipping pruner: for random
  * data, random physical layouts (hash / range / Z-order / hive
  * partitioned), and random predicates from a grammar covering every
  * supported shape, `readWhere` must return EXACTLY `read.filter` — the
  * pruner may only ever change which files are opened. A pruning bug that
  * drops a matching file fails the row-digest compare loudly.
  */
class LakeSkippingProperties extends SparkTestBase {
  import spark.implicits._

  private def tmpLake(): Lake = {
    val dir = Files.createTempDirectory("lake_prop").toString
    new Lake(spark, LakeConfig(basePath = dir))
  }

  test("generative: readWhere == read.filter over random layouts and predicates") {
    val rnd = new scala.util.Random(20260813L)

    def randomPredicate(depth: Int): Column = {
      def leaf(): Column = rnd.nextInt(11) match {
        case 0 => col("a") < rnd.nextInt(1300) // includes out-of-range cuts
        case 1 => col("a") >= rnd.nextInt(1300)
        case 2 => col("a") === rnd.nextInt(1300)
        case 3 => col("a").isin(rnd.nextInt(1300), rnd.nextInt(1300),
          rnd.nextInt(1300))
        case 4 => col("s") === s"s${rnd.nextInt(60)}"
        case 5 => col("s").startsWith(if (rnd.nextBoolean()) "s1" else "s4")
        case 6 => col("s").isNull
        case 7 => col("s").isNotNull
        case 8 => col("d") < rnd.nextDouble() * 110
        case 9 => col("s") =!= s"s${rnd.nextInt(60)}"
        case _ => col("p") === rnd.nextInt(6) // partition-column leaf
      }
      if (depth == 0) leaf()
      else rnd.nextInt(3) match {
        case 0 => randomPredicate(depth - 1) && randomPredicate(depth - 1)
        case 1 => randomPredicate(depth - 1) || randomPredicate(depth - 1)
        case _ => leaf()
      }
    }

    for (iter <- 0 until 5) {
      val lake = tmpLake()
      val n = 300 + rnd.nextInt(300)
      val df = (0 until n).map { _ =>
        (rnd.nextInt(1000).toLong,
          if (rnd.nextInt(8) == 0) null else s"s${rnd.nextInt(50)}",
          rnd.nextDouble() * 100,
          rnd.nextInt(5))
      }.toDF("a", "s", "d", "p")
      rnd.nextInt(4) match {
        case 0 => lake.writeAtomic(df.repartition(3 + rnd.nextInt(4)), "t")
        case 1 => lake.writeAtomic(df.repartitionByRange(5, col("a")), "t")
        case 2 =>
          lake.writeAtomic(df.repartition(4), "t")
          lake.compact("t", targetFileBytes = 4 * 1024,
            zorderBy = Seq("a", "d"))
        case _ => lake.writeAtomic(df, "t", partitionBy = Seq("p"))
      }
      val digest = Seq(count(lit(1)).as("n"),
        sum(pmod(xxhash64(col("a"), coalesce(col("s"), lit("NONE")),
          col("d").cast("string"), col("p")), lit(1000000007L))).as("h"))
      for (pi <- 0 until 6) {
        val pred = randomPredicate(2)
        val got = lake.readWhere("t", pred).agg(digest.head, digest.tail: _*)
          .collect().head
        val want = lake.read("t").filter(pred).agg(digest.head, digest.tail: _*)
          .collect().head
        assert(got == want,
          s"iter=$iter pred#$pi $pred: readWhere=$got filter=$want " +
            s"(prune: ${lake.pruneInfo("t", pred)})")
      }
    }
  }
}
