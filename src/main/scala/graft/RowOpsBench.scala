package graft

import newspipe.io.{Lake, LakeConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Row-op scale evidence (SCALE.md §Lake): measure that DELETE / MERGE
  * through manifest snapshots rewrite the touched FRACTION of a layer,
  * not the layer, and that the change feed reads the touched fraction,
  * not two snapshots.
  *
  * Protocol (lineitem, key-clustered into `files` files so stats bound
  * each file's key range; one JSON line at the end):
  *   1. land the layer once (`land_sec`, `files_total`);
  *   2. `deleteWhere` a ~1% key range → `delete_sec`,
  *      `delete_rewritten`/`delete_carried` (the carry ratio IS the claim);
  *   3. the full-rewrite baseline for the same delete (read + filter +
  *      writeAtomic the complement) → `delete_full_sec`;
  *   4. `mergeInto` a CDC batch (~0.2% of keys updated + as many fresh
  *      inserts) → `merge_sec`, `merge_rewritten`/`merge_carried`;
  *   5. `diff` across the two row ops → `diff_sec`, `diff_rows`
  *      (inserted+deleted), with the scan bounded by touched files only.
  *
  * The honest caveat printed with the numbers: at sf0.1 the layer is
  * ~600k rows across 64 files, so absolute times are driver-latency-bound;
  * the rewritten/carried RATIOS are the quantities that scale — at 10⁵
  * files a 1% delete is ~10³ rewritten files vs 10⁵ for the full rewrite.
  *
  * Run: `sbt "runMain graft.RowOpsBench [files]"` (default 64); env
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as graft.Bench.
  */
object RowOpsBench {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val v = f
    (v, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val files = args.headOption.map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("lake_rowops").toString
    val lake = new Lake(spark, LakeConfig(basePath = root))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .localCheckpoint(true)
    val maxKey = li.agg(max("l_orderkey")).head().getLong(0)

    // 1. land, key-clustered so per-file stats bound l_orderkey ranges
    val (_, landSec) = timed {
      lake.writeAtomic(li.repartitionByRange(files, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey"), "li")
    }

    // 2. selective delete: a ~1% contiguous key range
    val lo = maxKey / 2
    val hi = lo + math.max(1L, maxKey / 100)
    val (delRes, delSec) = timed {
      lake.deleteWhere("li", col("l_orderkey").between(lo, hi))
    }

    // 3. full-rewrite baseline of the SAME delete, to a scratch layer
    val (_, delFullSec) = timed {
      lake.writeAtomic(lake.read("li")
        .filter(!col("l_orderkey").between(lo, hi)), "li_full")
    }

    // 4. CDC merge, recency-shaped like real change capture: corrections
    // to the NEWEST ~1% of orders plus as many fresh inserts above the max
    // key. The composite-key can-match predicate is per-column ranges, so
    // a recency-clustered batch bounds to the tail files; a merge of keys
    // scattered uniformly over the full range would honestly rewrite
    // everything — recency clustering is what makes CDC cheap, here and at
    // 100 TB.
    val updKeys = li.filter(col("l_orderkey") >= maxKey - maxKey / 100)
    val cdc = updKeys.withColumn("l_returnflag", lit("U"))
      .union(updKeys.withColumn("l_orderkey", col("l_orderkey") + maxKey + 1))
      // the synthetic lineitem does not enforce TPC-H key uniqueness;
      // collapse to one row per key as a real CDC producer would
      .dropDuplicates("l_orderkey", "l_linenumber")
      // materialize the batch BEFORE timing: merge_sec should measure the
      // merge, not re-running the batch's dedup shuffle per merge action
      .localCheckpoint(true)
    val (mergeRes, mergeSec) = timed {
      lake.mergeInto("li", cdc, Seq("l_orderkey", "l_linenumber"))
    }

    // 5. change feed across both ops
    val versions = lake.listVersions("li")
    val (vBase, vHead) = (versions.last, versions.head)
    val ((nIns, nDel), diffSec) = timed {
      val (ins, del) = lake.diff("li", vBase, vHead)
      (ins.count(), del.count())
    }

    // 6. deletion-vector delete of a SCATTERED ~0.1% (every 1000th key):
    // the shape where even a manifest rewrite touches most files (the
    // keys hit every file's range) but a DV commit touches none — the
    // position list IS the commit. Same predicate through the rewrite
    // path as the honest baseline, on a fresh copy of the layer.
    val dvPred = col("l_orderkey") % 1000 === 0
    val (dvRes, dvSec) = timed { lake.deleteWhereDv("li", dvPred) }
    val (readDv, dvReadSec) = timed { lake.read("li").count() }
    lake.writeAtomic(li.repartitionByRange(files, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey"), "li_rw")
    val (rwRes, rwSec) = timed { lake.deleteWhere("li_rw", dvPred) }

    val json =
      s"""{"metric":"lake_rowops","files":$files,"sf":"$sfDir",
         |"land_sec":$landSec,
         |"delete_sec":$delSec,"delete_rewritten":${delRes.rewrittenFiles},
         |"delete_carried":${delRes.carriedFiles},
         |"delete_full_sec":$delFullSec,
         |"merge_sec":$mergeSec,"merge_rewritten":${mergeRes.rewrittenFiles},
         |"merge_carried":${mergeRes.carriedFiles},
         |"diff_sec":$diffSec,"diff_inserted":$nIns,"diff_deleted":$nDel,
         |"dv_delete_sec":$dvSec,"dv_rewritten":${dvRes.rewrittenFiles},
         |"dv_carried":${dvRes.carriedFiles},
         |"dv_read_sec":$dvReadSec,"dv_read_rows":$readDv,
         |"scattered_rewrite_sec":$rwSec,
         |"scattered_rewritten":${rwRes.rewrittenFiles}}"""
        .stripMargin.replace("\n", "")
    try {
      val out = java.nio.file.Paths.get("target", "lake_rowops.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out, json + "\n")
    } catch { case _: Throwable => () }
    println(json)
    spark.stop()
  }
}
