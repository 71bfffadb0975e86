package newspipe.io

import java.nio.file.Files

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** Protocol feature gates (Delta's readerFeatures role): every commit
  * document records which protocol features its content requires of a
  * reader, and parsing refuses loudly on features this build does not
  * know — an older engine reading a newer-featured layer fails at the
  * protocol layer instead of silently misreading (resurrecting DV'd
  * rows, reading physical column names, double-allocating row ids).
  */
class LakeFeatureGateSpec extends SparkTestBase {
  import spark.implicits._

  private def freshLake(): (String, Lake) = {
    val dir = Files.createTempDirectory("lakefeat").toString
    (dir, new Lake(spark, LakeConfig(basePath = dir)))
  }

  /** The head version's commit document (full manifest or delta doc). */
  private def headDoc(base: String, layer: String,
      lake: Lake): java.io.File = {
    val head = lake.listVersions(layer).head
    val dir = new java.io.File(s"$base/$layer/_v/$head")
    Seq(SnapshotManifest.FileName, DeltaDoc.FileName)
      .map(n => new java.io.File(dir, n)).find(_.exists())
      .getOrElse(fail(s"no commit document in $dir"))
  }

  /** Rewrite a commit document in place (drops Hadoop's .crc sidecar so
    * the local FS serves the edited bytes instead of failing checksum). */
  private def rewrite(doc: java.io.File, body: String): Unit = {
    Files.writeString(doc.toPath, body)
    new java.io.File(doc.getParentFile, s".${doc.getName}.crc").delete()
  }

  test("feature-free layers record no features field (old layers " +
      "unaffected); feature-bearing commits record exactly their set") {
    val (dir, lake) = freshLake()
    lake.writeAtomic(Seq((1L, "a"), (2L, "b")).toDF("id", "text"), "t")
    lake.appendAtomic(Seq((3L, "c")).toDF("id", "text"), "t")
    val plain = Files.readString(headDoc(dir, "t", lake).toPath)
    plain should not include "features"
    // deletion vectors → the commit declares the feature
    lake.setProperties("t", Map("lake.enableDeletionVectors" -> "true"))
    lake.deleteWhereDv("t", $"id" === 2L)
    val dv = Files.readString(headDoc(dir, "t", lake).toPath)
    dv should include(""""features"""")
    dv should include("deletionVectors")
    // column mapping rename → columnMapping joins the set
    lake.setProperties("t", Map("lake.columnMapping.mode" -> "name"))
    lake.renameColumn("t", "text", "body")
    val cm = Files.readString(headDoc(dir, "t", lake).toPath)
    cm should include("columnMapping")
    // this build supports everything it writes: reads stay green
    lake.read("t").columns.sorted shouldBe Array("body", "id")
  }

  test("an unknown required feature refuses loudly at read, naming the " +
      "feature") {
    val (dir, lake) = freshLake()
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "t")
    lake.enableRowTracking("t") // guarantees a manifest-carrying head
    val doc = headDoc(dir, "t", lake)
    val json = Files.readString(doc.toPath)
    val injected =
      if (json.contains("\"features\":["))
        json.replaceFirst("\"features\":\\[",
          "\"features\":[\"futuristicCompression\",")
      else json.replaceFirst("\\{",
        "{\"features\":[\"futuristicCompression\"],")
    rewrite(doc, injected)
    // a fresh engine instance (no warm manifest cache) = the older-build
    // read posture
    val reader = new Lake(spark, LakeConfig(basePath = dir))
    val e = intercept[IllegalStateException] {
      reader.read("t").collect()
    }
    e.getMessage should include("futuristicCompression")
    e.getMessage should include("does not support")
  }

  test("an unknown feature in a DELTA commit document refuses the fold " +
      "too") {
    val (dir, lake) = freshLake()
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "t")
    lake.deleteWhere("t", $"id" === 99L) // no-op rewrite → delta-or-manifest
    lake.appendAtomic(Seq((2L, "b")).toDF("id", "text"), "t")
    val doc = headDoc(dir, "t", lake)
    val json = Files.readString(doc.toPath)
    rewrite(doc, json.replaceFirst("\\{",
      "{\"features\":[\"quantumMerge\"],"))
    val reader = new Lake(spark, LakeConfig(basePath = dir))
    val e = intercept[IllegalStateException] {
      reader.read("t").collect()
    }
    e.getMessage should include("quantumMerge")
  }

  test("writer feature gate: an unknown lake.requiredWriterFeatures " +
      "entry refuses COMMITS loudly; reads stay unaffected") {
    val (_, lake) = freshLake()
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "t")
    // known features pass
    lake.setProperties("t", Map(Lake.WriterFeaturesProp ->
      "constraints,defaults"))
    lake.appendAtomic(Seq((2L, "b")).toDF("id", "text"), "t")
    // an unknown one refuses every commit path, reads keep serving
    lake.setProperties("t", Map(Lake.WriterFeaturesProp ->
      "constraints,futureWriteRule"))
    val e = intercept[IllegalStateException] {
      lake.appendAtomic(Seq((3L, "c")).toDF("id", "text"), "t")
    }
    e.getMessage should include("futureWriteRule")
    e.getMessage should include("reads are unaffected")
    intercept[IllegalStateException] {
      lake.deleteWhere("t", $"id" === 1L)
    }.getMessage should include("futureWriteRule")
    lake.read("t").count() shouldBe 2L
    // clearing the declaration restores writability
    lake.setProperties("t", Map(Lake.WriterFeaturesProp -> ""))
    lake.appendAtomic(Seq((4L, "d")).toDF("id", "text"), "t")
    lake.read("t").count() shouldBe 3L
  }

  test("round-trip: supported features survive re-serialization and " +
      "VARIANT schemas declare the variant feature") {
    val m = SnapshotManifest(Seq("f1.parquet"), "`id` BIGINT,`v` VARIANT",
      mapping = Map("id" -> "id_phys"))
    val json = SnapshotManifest.toJson(m)
    json should include("columnMapping")
    json should include("variant")
    val back = SnapshotManifest.fromJson(json)
    back.features.sorted shouldBe Seq("columnMapping", "variant")
    // a column merely NAMED variant does not trip the type detection
    val named = SnapshotManifest(Seq("f.parquet"), "`VARIANT` BIGINT")
    SnapshotManifest.toJson(named) should not include "features"
  }
}
