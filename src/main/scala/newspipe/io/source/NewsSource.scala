package newspipe.io.source

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import newspipe.model.Schemas
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** Partitioned DataSourceV2 for NewsAPI-shaped article pages — the scale
  * path for SURVEY.md §2.1 S1 (the reference fetches ONE page on the driver,
  * `01_bronze_ingestion_news_articles.py:16-23`; at scale the fetch itself
  * must parallelize).
  *
  * One InputPartition per page; each PartitionReader fetches and parses its
  * page ON AN EXECUTOR, so ingest throughput scales with the cluster, not
  * the driver. Schema is the fixed bronze-raw StructType — declared, never
  * inferred, exactly like the reference's hand-written schema.
  *
  * Usage:
  * {{{
  *   spark.read.format("newspipe.io.source.NewsSource")
  *     .option("pages", "8")             // page-count → partition count
  *     .option("fixtureDir", dir)        // offline: read page-<i>.json files
  *     // .option("endpoint", url)       // online: GET <url>&page=<i>
  *     // .option("apiKeyEnv", "NEWS_API_KEY")
  *     .load()
  * }}}
  *
  * The HTTP path uses java.net.http.HttpClient per partition. This build
  * environment has no egress, so the HTTP branch is exercised only through
  * its fixture-backed twin (same parse path, same reader); both produce the
  * raw JSON page body handed to the shared parser.
  */
class NewsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Schemas.bronzeRaw.add("page", "int")

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new NewsTable(properties.asScala.toMap)
}

final class NewsTable(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "news_articles_source"
  override def schema(): StructType = Schemas.bronzeRaw.add("page", "int")
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = options ++ caseInsensitive.asScala
    () => new NewsScan(merged)
  }
}

final class NewsScan(options: Map[String, String]) extends Scan with Batch {
  override def readSchema(): StructType = Schemas.bronzeRaw.add("page", "int")
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val pages = options.getOrElse("pages", "1").toInt
    (1 to pages).map(i => NewsPagePartition(i, options): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new NewsPageReader(partition.asInstanceOf[NewsPagePartition])
}

final case class NewsPagePartition(page: Int, options: Map[String, String])
    extends InputPartition

/** Runs on an executor: fetch page body (fixture file or HTTP), parse the
  * `articles[]` array with the fixed schema (missing keys → null, never an
  * error — mirrors `spark.read.schema(...).json` null-safety).
  */
final class NewsPageReader(p: NewsPagePartition) extends PartitionReader[InternalRow] {
  private lazy val articles: Iterator[JsonNode] = {
    val body = p.options.get("fixtureDir") match {
      case Some(dir) =>
        val f = java.nio.file.Paths.get(dir, s"page-${p.page}.json")
        if (java.nio.file.Files.exists(f)) java.nio.file.Files.readString(f) else """{"articles":[]}"""
      case None =>
        val endpoint = p.options.getOrElse("endpoint",
          throw new IllegalArgumentException("need endpoint or fixtureDir"))
        val key = p.options.get("apiKeyEnv").flatMap(e => sys.env.get(e)).getOrElse("")
        val uri = java.net.URI.create(s"$endpoint&page=${p.page}&apiKey=$key")
        val client = java.net.http.HttpClient.newHttpClient()
        client.send(java.net.http.HttpRequest.newBuilder(uri).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString()).body()
    }
    val root = new ObjectMapper().readTree(body)
    Option(root.get("articles")).map(_.elements().asScala).getOrElse(Iterator.empty)
  }
  private var current: JsonNode = _

  override def next(): Boolean = {
    if (articles.hasNext) { current = articles.next(); true } else false
  }

  private def str(node: JsonNode, field: String): UTF8String = {
    val v = node.get(field)
    if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
  }

  override def get(): InternalRow = {
    val src = current.get("source")
    val sourceRow =
      if (src == null || src.isNull) null
      else new GenericInternalRow(Array[Any](str(src, "name")))
    new GenericInternalRow(Array[Any](
      sourceRow,
      str(current, "author"), str(current, "title"), str(current, "description"),
      str(current, "url"), str(current, "urlToImage"), str(current, "publishedAt"),
      str(current, "content"), str(current, "ingestion_time"), str(current, "country"),
      p.page))
  }

  override def close(): Unit = ()
}
