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
  * `startingVersion` option: `earliest` (default) replays the OLDEST
  * retained snapshot as inserts and then every delta after it; `latest`
  * starts from the current snapshot (deltas only, no initial load); an
  * explicit version id starts right after that version. Vacuum contract:
  * consumers must keep up faster than retention reclaims versions — a
  * diff against a vacuumed version fails loudly (same as Delta's
  * data-retention streaming failure), never silently skips.
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
      parameters.getOrElse("startingVersion", "earliest"))
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
    layer: String, startingVersion: String) extends Source {

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
  private val baseVersion: Option[String] = startingVersion match {
    case "earliest" => None
    case "latest" => lake.listVersions(layer).headOption
    case v =>
      require(lake.listVersions(layer).contains(v),
        s"startingVersion '$v' is not a committed snapshot of '$layer' " +
          s"(known: ${lake.listVersions(layer).mkString(", ")})")
      Some(v)
  }

  override def getOffset: Option[V1Offset] =
    lake.listVersions(layer).headOption.map(VersionOffset)

  /** Conform a delta leg to the DECLARED stream schema: a streaming
    * source's schema is fixed at query start, but the layer's can evolve
    * mid-stream (schema-evolving merge/append). Columns the leg predates
    * pad with null; columns an evolution ADDED after stream start are
    * projected away until the consumer restarts — the restart re-resolves
    * the schema and sees them (Delta's contract, minus the hard failure).
    */
  private def conform(df: DataFrame,
      changeType: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val padded = layerSchema.fields.foldLeft(df)((d, f) =>
      if (d.columns.contains(f.name)) d
      else d.withColumn(f.name, lit(null).cast(f.dataType)))
    padded.select((layerSchema.fieldNames.map(col) :+
      lit(changeType).as(LakeChangeSource.ChangeTypeCol)).toSeq: _*)
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endV = versionOf(end)
    val batch: DataFrame = start.map(versionOf).orElse(baseVersion) match {
      case Some(fromV) if fromV == endV =>
        conform(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], layerSchema),
          "insert")
      case Some(fromV) =>
        val (inserted, deleted) = lake.diff(layer, fromV, endV)
        conform(inserted, "insert").unionByName(conform(deleted, "delete"))
      case None =>
        // initial load: the OLDEST retained snapshot as inserts, plus the
        // delta up to this batch's end version when more snapshots
        // committed before the first poll — the batch must cover
        // everything at or before `end`, not just the oldest state
        val oldest = lake.listVersions(layer).last
        val initial = conform(lake.readVersion(layer, oldest), "insert")
        if (oldest == endV) initial
        else {
          val (inserted, deleted) = lake.diff(layer, oldest, endV)
          initial.unionByName(conform(inserted, "insert"))
            .unionByName(conform(deleted, "delete"))
        }
    }
    NewspipeSqlBridge.streamingDataFrame(batch)
  }

  override def stop(): Unit = ()
}
