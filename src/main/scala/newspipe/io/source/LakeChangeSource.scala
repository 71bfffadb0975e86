package newspipe.io.source

import newspipe.io.{Lake, LakeConfig}
import org.apache.spark.sql.{DataFrame, NewspipeSqlBridge, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Streaming CHANGE FEED over a lake layer — the consume side of the CDC
  * story ([[newspipe.streaming.StreamingSilver.upsertToLake]] produces,
  * this reads): `spark.readStream.format("newspipe.io.source.
  * LakeChangeSource").option("basePath", ...).option("layer", ...)` emits
  * each committed snapshot's row-level delta as it commits, rows tagged
  * `_change_type` = `insert` | `delete` (an update is one of each — the
  * same CDF shape Delta's `readChangeFeed` exposes).
  *
  * Offsets are committed version ids (zero-padded millis — lexicographic
  * = time order, so offset progression IS the snapshot lineage, restart-
  * safe through the checkpoint). Each micro-batch is
  * [[newspipe.io.Lake.diff]] between consecutive polled versions: only the
  * two snapshots' symmetric-difference files are read, so a batch costs
  * ~2× the touched fraction — incremental consumption stays proportional
  * to change volume, not layer size, which is the property that matters
  * when the layer is 100 TB and a delete touched 1% of it.
  *
  * Options:
  *  - `startingVersion`: `earliest` (default) replays the OLDEST retained
  *    snapshot as inserts and then every delta after it; `latest` starts
  *    from the current snapshot (deltas only, no initial load); an
  *    explicit version id starts right after that version.
  *  - `startingTimestamp`: epoch millis; resolves to the snapshot the
  *    table had at that instant (exactly [[Lake.resolveVersionAt]], the
  *    `readAsOf` rule) and starts right after it — mutually exclusive
  *    with `startingVersion`.
  *  - `maxVersionsPerTrigger`: admission control (Delta's
  *    `maxFilesPerTrigger` role at this source's natural granularity):
  *    each micro-batch advances at most N committed versions. BEST
  *    EFFORT, exactly like Delta's: the first trigger after a (re)start
  *    serves the full backlog — the DSv1 contract gives the source no
  *    view of the restored offset until `getBatch`, and capping blind
  *    risks serving a reversed range. From the second trigger on, the
  *    cap holds; with N=1 every batch is exactly one commit's delta.
  *  - `keyColumns` (csv): four-tag CDF — per commit, a key present on
  *    both sides surfaces as `update_preimage`/`update_postimage`
  *    instead of delete+insert ([[Lake.changeFeedKeyed]] semantics,
  *    classified per commit even when one batch spans several commits).
  *
  * Vacuum contract: consumers must keep up faster than retention reclaims
  * versions — a diff against a vacuumed version fails loudly (same as
  * Delta's data-retention streaming failure), never silently skips.
  *
  * DSv1 `Source` (getOffset/getBatch) rather than DSv2 MicroBatchStream,
  * deliberately: getBatch returns a DataFrame, letting the batch reuse
  * Spark's own vectorized parquet scan over the diff's file list — the
  * pattern Delta's streaming source uses — where a DSv2 PartitionReader
  * would mean hand-rolling parquet record materialization.
  */
class LakeChangeSource extends StreamSourceProvider {

  private def layerOf(parameters: Map[String, String]): (String, String) = {
    val base = parameters.getOrElse("basePath", throw new IllegalArgumentException(
      "LakeChangeSource requires option 'basePath' (the lake root)"))
    val layer = parameters.getOrElse("layer", throw new IllegalArgumentException(
      "LakeChangeSource requires option 'layer'"))
    // validated here (sourceSchema runs at load(), synchronously) so the
    // conflict surfaces at stream BUILD time, not as an async query error
    require(!(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
      "options 'startingVersion' and 'startingTimestamp' are mutually " +
        "exclusive — they both pick the stream's starting snapshot")
    (base, layer)
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val (base, layer) = layerOf(parameters)
    val lake = new Lake(sqlContext.sparkSession, LakeConfig(basePath = base))
    (providerName, LakeChangeSource.cdfSchema(lake.layerSchema(layer)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val (base, layer) = layerOf(parameters)
    new LakeChangeStream(sqlContext.sparkSession, base, layer,
      parameters.getOrElse("startingVersion", "earliest"),
      parameters.get("startingTimestamp").map(_.toLong),
      parameters.get("maxVersionsPerTrigger").map { v =>
        val n = v.toInt
        require(n >= 1, s"maxVersionsPerTrigger must be >= 1, got $n")
        n
      },
      parameters.get("keyColumns").toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty))
  }
}

object LakeChangeSource {
  val ChangeTypeCol = "_change_type"

  def cdfSchema(layerSchema: StructType): StructType =
    StructType(layerSchema.fields :+ StructField(ChangeTypeCol, StringType,
      nullable = false))
}

/** One [[LakeChangeSource]] stream instance. Offset json = version id. */
private[source] class LakeChangeStream(spark: SparkSession, basePath: String,
    layer: String, startingVersion: String, startingTimestamp: Option[Long],
    maxVersionsPerTrigger: Option[Int], keyColumns: Seq[String])
    extends Source {

  private val lake = new Lake(spark, LakeConfig(basePath = basePath))
  private val layerSchema = lake.layerSchema(layer)
  override val schema: StructType = LakeChangeSource.cdfSchema(layerSchema)

  private case class VersionOffset(version: String) extends V1Offset {
    override def json: String = version
  }
  private def versionOf(o: V1Offset): String = o.json

  /** Version the FIRST batch diffs from; None = replay the oldest retained
    * snapshot in full. Resolved once at stream start ("latest" must pin
    * what "current" meant then, not at first-batch time).
    */
  private val baseVersion: Option[String] = startingTimestamp match {
    case Some(ts) => Some(lake.resolveVersionAt(layer, ts))
    case None => startingVersion match {
      case "earliest" => None
      case "latest" => lake.listVersions(layer).headOption
      case v =>
        require(lake.listVersions(layer).contains(v),
          s"startingVersion '$v' is not a committed snapshot of '$layer' " +
            s"(known: ${lake.listVersions(layer).mkString(", ")})")
        Some(v)
    }
  }

  /** End version of the last batch THIS process served — the anchor the
    * admission cap advances from. Deliberately not recovered from the
    * checkpoint (DSv1 gives the source no committed-offset view before
    * getBatch), which is why the cap is best-effort on the first trigger.
    */
  @volatile private var lastEnd: Option[String] = None

  override def getOffset: Option[V1Offset] = {
    val newestFirst = lake.listVersions(layer)
    if (newestFirst.isEmpty) return None
    val end = (maxVersionsPerTrigger, lastEnd) match {
      case (Some(n), Some(last)) =>
        val asc = newestFirst.reverse
        val i = asc.indexOf(last)
        // last already vacuumed: advancing blind could reverse the range;
        // serve the head and let getBatch's diff fail loudly if the START
        // was reclaimed too (the vacuum contract)
        if (i < 0) newestFirst.head
        else asc(math.min(i + n, asc.size - 1))
      case _ => newestFirst.head
    }
    Some(VersionOffset(end))
  }

  /** Conform a delta leg to the DECLARED stream schema: a streaming
    * source's schema is fixed at query start, but the layer's can evolve
    * mid-stream (schema-evolving merge/append). Columns the leg predates
    * pad with null; columns an evolution ADDED after stream start are
    * projected away until the consumer restarts — the restart re-resolves
    * the schema and sees them (Delta's contract, minus the hard failure).
    */
  private def conform(df: DataFrame,
      changeType: String): DataFrame =
    conformTagged(df.withColumn(LakeChangeSource.ChangeTypeCol,
      lit(changeType)))

  /** [[conform]] for frames that already CARRY a per-row `_change_type`
    * (the keyed four-tag feed).
    */
  private def conformTagged(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit => flit}
    val padded = layerSchema.fields.foldLeft(df)((d, f) =>
      if (d.columns.contains(f.name)) d
      else d.withColumn(f.name, flit(null).cast(f.dataType)))
    padded.select((layerSchema.fieldNames.map(col) :+
      col(LakeChangeSource.ChangeTypeCol)).toSeq: _*)
  }

  /** The delta between two committed versions, tagged: the keyed four-tag
    * classification when `keyColumns` is set (per commit, even across a
    * multi-commit batch), the plain insert/delete pair otherwise.
    */
  private def delta(fromV: String, endV: String): DataFrame =
    if (keyColumns.nonEmpty)
      conformTagged(lake.changeFeedKeyed(layer, fromV, endV, keyColumns))
    else {
      val (inserted, deleted) = lake.diff(layer, fromV, endV)
      conform(inserted, "insert").unionByName(conform(deleted, "delete"))
    }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endV = versionOf(end)
    lastEnd = Some(endV)
    val batch: DataFrame = start.map(versionOf).orElse(baseVersion) match {
      case Some(fromV) if fromV == endV =>
        conform(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], layerSchema),
          "insert")
      case Some(fromV) =>
        delta(fromV, endV)
      case None =>
        // initial load: the OLDEST retained snapshot as inserts, plus the
        // delta up to this batch's end version when more snapshots
        // committed before the first poll — the batch must cover
        // everything at or before `end`, not just the oldest state
        val oldest = lake.listVersions(layer).last
        val initial = conform(lake.readVersion(layer, oldest), "insert")
        if (oldest == endV) initial
        else initial.unionByName(delta(oldest, endV))
    }
    NewspipeSqlBridge.streamingDataFrame(batch)
  }

  override def stop(): Unit = ()
}
