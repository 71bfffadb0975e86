package newspipe.io

import newspipe.model.Schemas
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Lake reader/writer — the reference's `write_to_datalake` /
  * `write_to_datalake_and_hive` (_lib_dq_helpers.py:21-54,198-233) and its
  * `spark.read.format("delta").load` call sites, behind a format abstraction.
  *
  * The reference's storage format is Delta, but the only Delta semantics it
  * exercises are batch read, append/overwrite write, and partitionBy — all
  * fully covered by Parquet + directory layout (SURVEY.md §2.1 S3). This
  * build has no Delta jars (zero-egress image), so `format` defaults to
  * parquet; ACID/time-travel are not exercised by the reference and not
  * claimed here.
  */
final case class LakeConfig(
    basePath: String,
    format: String = "parquet",
    database: String = "news_articles")

final class Lake(spark: SparkSession, config: LakeConfig) {

  private def layerPath(layer: String): String =
    s"${config.basePath.stripSuffix("/")}/$layer"

  /** Ref _lib:21-54: writer-builder with optional partitioning. */
  def write(df: DataFrame, layer: String,
      partitionBy: Seq[String] = Nil, mode: String = "append"): String = {
    val path = layerPath(layer)
    var writer = df.write.format(config.format).mode(mode)
    if (partitionBy.nonEmpty) writer = writer.partitionBy(partitionBy: _*)
    writer.save(path)
    path
  }

  /** Ref 02:29, 03:30: batch read of a layer. */
  def read(layer: String): DataFrame =
    spark.read.format(config.format).load(layerPath(layer))

  /** Ref _lib:198-233: lake write + catalog publish. The reference writes the
    * data TWICE (delta `save` + hive `saveAsTable`, recomputing the plan);
    * here the second copy is a metastore-managed table written once from the
    * (already narrow) frame. Works against Hive or the in-memory catalog.
    */
  def writeAndPublish(df: DataFrame, layer: String, table: String,
      partitionBy: Seq[String] = Nil, mode: String = "overwrite"): String = {
    val path = write(df, layer, partitionBy, mode)
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${config.database}")
    df.write.format(config.format).mode(SaveMode.valueOf(mode.capitalize))
      .saveAsTable(s"${config.database}.$table")
    path
  }
}

/** Raw landing-zone put — ref S8 (`dbutils.fs.put` of the raw API JSON,
  * docs/pipeline_overview.md:36): write the unparsed payload beside the
  * bronze table for replay/audit.
  */
object RawLanding {
  def put(basePath: String, name: String, body: String): java.nio.file.Path = {
    val dir = java.nio.file.Paths.get(basePath, "raw")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve(name), body)
  }
}

/** Bronze-shaped JSON source — the fixture-file stand-in for the reference's
  * NewsAPI fetch (01_bronze_ingestion_news_articles.py:16-23). Reading with
  * an EXPLICIT schema (never inferred) mirrors the reference's hand-written
  * StructType and is null-safe for missing keys.
  */
object JsonSource {
  def readArticles(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.bronzeRaw).json(path)

  /** In-memory variant for tests / driver-side API payloads: JSON lines
    * already fetched (the reference materializes the API page on the driver;
    * same crossing, then distributed parse).
    */
  def fromJsonLines(spark: SparkSession, lines: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.schema(Schemas.bronzeRaw).json(lines.toDS())
  }
}
