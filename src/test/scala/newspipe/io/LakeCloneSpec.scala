package newspipe.io

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Shallow CLONE ([[Lake.clone]]): zero-copy manifest fork of a layer,
  * independent evolution of clone and source, vacuum safety in BOTH
  * directions (cross-layer pinning), time-travel forks, and the
  * `CREATE TABLE … SHALLOW CLONE` statement.
  */
class LakeCloneSpec extends SparkTestBase {
  import spark.implicits._

  private def newBase(): String =
    Files.createTempDirectory("lake_clone").toString

  private def lakeAt(base: String): Lake =
    new Lake(spark, LakeConfig(basePath = base))

  private def dataFilesUnder(base: String, layer: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$base/$layer")
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) return Nil
    val it = f.listFiles(p, true)
    val b = Seq.newBuilder[String]
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && s.getPath.getName.endsWith(".parquet"))
        b += s.getPath.toString
    }
    b.result()
  }

  private def manifestFiles(base: String, layer: String): Seq[String] = {
    val lake = lakeAt(base)
    val v = lake.listVersions(layer).head
    val p = java.nio.file.Paths.get(s"$base/$layer/_v/$v/_MANIFEST.json")
    // a self-contained snapshot (e.g. post-compact) has no manifest —
    // and by construction no cross-layer references
    if (!java.nio.file.Files.exists(p)) return Nil
    val json = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    "\"(\\.\\./)?[^\"]*\\.parquet\"".r.findAllIn(json)
      .map(_.stripPrefix("\"").stripSuffix("\"")).toSeq
  }

  test("clone copies ZERO data files and reads identically") {
    val base = newBase()
    val lake = lakeAt(base)
    lake.writeAtomic(spark.range(100).select(col("id"),
      (col("id") % 7).as("k")), "src")
    val before = dataFilesUnder(base, "src")
    lake.clone("src", "fork")
    // the fork holds NO parquet of its own; its manifest references ../src
    dataFilesUnder(base, "fork") shouldBe empty
    dataFilesUnder(base, "src") should contain theSameElementsAs before
    assert(manifestFiles(base, "fork").forall(_.startsWith("../src/")))
    lake.read("fork").count() shouldBe 100L
    lake.read("fork").agg(sum("id")).as[Long].head() shouldBe 4950L
  }

  test("clone and source evolve independently") {
    val base = newBase()
    val lake = lakeAt(base)
    lake.writeAtomic(spark.range(50).toDF("id"), "src")
    lake.clone("src", "fork")
    // append lands only in the fork
    lake.appendAtomic(spark.range(50, 60).toDF("id"), "fork")
    lake.read("fork").count() shouldBe 60L
    lake.read("src").count() shouldBe 50L
    // a rewrite on the source never shows through the fork (it pins the
    // cloned snapshot's file set, not the source HEAD)
    lake.deleteWhere("src", col("id") < 25)
    lake.read("src").count() shouldBe 25L
    lake.read("fork").count() shouldBe 60L
    // row op on the fork rewrites fork-locally; source untouched
    val srcFiles = dataFilesUnder(base, "src")
    lake.deleteWhere("fork", col("id") >= 55)
    lake.read("fork").count() shouldBe 55L
    dataFilesUnder(base, "src") should contain theSameElementsAs srcFiles
    lake.read("src").count() shouldBe 25L
  }

  test("clone VERSION AS OF forks mid-history") {
    val base = newBase()
    val lake = lakeAt(base)
    lake.writeAtomic(spark.range(10).toDF("id"), "src")
    val v1 = lake.listVersions("src").head
    lake.appendAtomic(spark.range(10, 30).toDF("id"), "src")
    lake.clone("src", "asof", version = Some(v1))
    lake.read("asof").count() shouldBe 10L
    lake.read("src").count() shouldBe 30L
  }

  test("vacuum on the source pins versions a clone references") {
    val base = newBase()
    val lake = lakeAt(base)
    lake.writeAtomic(spark.range(20).toDF("id"), "src")
    val v1 = lake.listVersions("src").head
    lake.clone("src", "fork", version = Some(v1))
    // bury v1 under FULL overwrites (no carry-by-reference into v1 —
    // appends would pin v1 through src's own head), then vacuum hard
    lake.writeAtomic(spark.range(20, 40).toDF("id"), "src")
    lake.writeAtomic(spark.range(40, 60).toDF("id"), "src")
    lake.vacuum("src", keep = 1, orphanGraceMs = 0L)
    // v1 survived (cross-layer pin) — the fork still reads
    assert(lake.listVersions("src").contains(v1))
    lake.read("fork").count() shouldBe 20L
    // once the fork materializes (compact rewrites into its own files),
    // a later source vacuum CAN reclaim v1
    lake.compact("fork")
    assert(manifestFiles(base, "fork").forall(!_.startsWith("../")))
    lake.vacuum("fork", keep = 1, orphanGraceMs = 0L)
    lake.vacuum("src", keep = 1, orphanGraceMs = 0L)
    assert(!lake.listVersions("src").contains(v1))
    lake.read("fork").count() shouldBe 20L
  }

  test("vacuum on the clone never touches source version dirs") {
    val base = newBase()
    val lake = lakeAt(base)
    lake.writeAtomic(spark.range(10).toDF("id"), "src")
    lake.clone("src", "fork")
    lake.appendAtomic(spark.range(10, 20).toDF("id"), "fork")
    lake.appendAtomic(spark.range(20, 30).toDF("id"), "fork")
    val srcVersions = lake.listVersions("src")
    lake.vacuum("fork", keep = 1, orphanGraceMs = 0L)
    lake.listVersions("src") shouldBe srcVersions
    lake.read("fork").count() shouldBe 30L
    lake.read("src").count() shouldBe 10L
  }

  test("partitioned sources clone with pruning intact") {
    val base = newBase()
    val lake = lakeAt(base)
    lake.writeAtomic(spark.range(40).select(col("id"),
      (col("id") % 4).cast("string").as("p")), "src",
      partitionBy = Seq("p"))
    lake.clone("src", "fork")
    lake.read("fork").count() shouldBe 40L
    lake.read("fork").filter(col("p") === "2").count() shouldBe 10L
  }

  test("clone of a clone stays lake-base-scoped (no nested ../)") {
    val base = newBase()
    val lake = lakeAt(base)
    lake.writeAtomic(spark.range(15).toDF("id"), "a")
    lake.clone("a", "b")
    lake.clone("b", "c")
    // c's refs point straight at a (the already-scoped rels pass through)
    assert(manifestFiles(base, "c").forall(_.startsWith("../a/")))
    lake.read("c").count() shouldBe 15L
  }

  test("clone of a DV-carrying snapshot keeps the deletes hidden") {
    val base = newBase()
    val lake = lakeAt(base)
    lake.writeAtomic(spark.range(100).toDF("id"), "src")
    lake.setProperties("src", Map("lake.enableDeletionVectors" -> "true"))
    lake.deleteWhereDv("src", col("id") < 10)
    lake.read("src").count() shouldBe 90L
    lake.clone("src", "fork")
    // the payload document keys positions by SOURCE-relative rels; the
    // clone's cross-layer refs must still resolve them (dvPairs strips
    // the ../src/ prefix for the lookup)
    lake.read("fork").count() shouldBe 90L
    lake.read("fork").agg(min("id")).as[Long].head() shouldBe 10L
    // DV deletes ON the clone are refused (two rel spellings in one map
    // is how deletes get silently lost); the rewrite path works
    val e = intercept[IllegalArgumentException] {
      lake.deleteWhereDv("fork", col("id") < 20)
    }
    assert(e.getMessage.contains("cross-layer"))
    lake.deleteWhere("fork", col("id") < 20)
    lake.read("fork").count() shouldBe 80L
    lake.read("src").count() shouldBe 90L
  }

  test("clone of a convertToLake-adopted layer reads (flat cross refs)") {
    val base = newBase()
    val lake = lakeAt(base)
    // flat parquet landed OUTSIDE the protocol, then adopted in place
    spark.range(60).toDF("id").write.parquet(s"$base/src")
    lake.convertToLake("src")
    lake.clone("src", "fork")
    dataFilesUnder(base, "fork") shouldBe empty
    lake.read("fork").count() shouldBe 60L
    lake.read("fork").agg(sum("id")).as[Long].head() shouldBe (0L until 60L).sum
    // row ops on the flat-ref clone rewrite clone-locally
    lake.deleteWhere("fork", col("id") < 10)
    lake.read("fork").count() shouldBe 50L
    lake.read("src").count() shouldBe 60L
  }

  test("vacuum consults only siblings whose _CLONE_SOURCES marker names " +
      "this layer") {
    val base = newBase()
    val lake = lakeAt(base)
    lake.writeAtomic(spark.range(10).toDF("id"), "src")
    lake.clone("src", "fork")
    assert(new java.io.File(s"$base/fork/_CLONE_SOURCES").exists())
    val named = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/fork/_CLONE_SOURCES")), "UTF-8")
    named.trim shouldBe "src"
    // a non-clone sibling has no marker
    lake.writeAtomic(spark.range(5).toDF("id"), "other")
    assert(!new java.io.File(s"$base/other/_CLONE_SOURCES").exists())
  }

  test("refusals: occupied destination, missing source, bloom on a clone") {
    val base = newBase()
    val lake = lakeAt(base)
    lake.writeAtomic(spark.range(5).toDF("id"), "src")
    lake.writeAtomic(spark.range(5).toDF("id"), "taken")
    intercept[IllegalArgumentException] { lake.clone("src", "taken") }
    intercept[IllegalArgumentException] { lake.clone("nope", "x") }
    lake.clone("src", "fork")
    val e = intercept[IllegalArgumentException] {
      lake.enableBloomIndex("fork", Seq("id"))
    }
    assert(e.getMessage.contains("cross-layer"))
  }

  test("CREATE TABLE … SHALLOW CLONE through the recognizer (+ catalog form)") {
    val base = newBase()
    val lake = lakeAt(base)
    lake.writeAtomic(spark.range(25).toDF("id"), "src")
    val row = LakeSql.sql(spark,
      s"CREATE TABLE lake.`$base`.fork SHALLOW CLONE lake.`$base`.src")
      .collect().head
    row.getString(0) shouldBe "CLONE"
    lake.read("fork").count() shouldBe 25L
    // catalog-qualified form resolves through the catalog's basePath conf
    spark.conf.set("spark.sql.catalog.clonecat",
      classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.clonecat.basePath", base)
    LakeSql.sql(spark,
      "CREATE TABLE clonecat.fork2 SHALLOW CLONE clonecat.src " +
        s"VERSION AS OF '${lake.listVersions("src").head}'")
      .collect().head.getString(0) shouldBe "CLONE"
    lake.read("fork2").count() shouldBe 25L
    spark.sql("SELECT count(*) AS n FROM clonecat.fork2")
      .as[Long].head() shouldBe 25L
    // cross-base targets route through cloneFrom (absolute base: refs)
    val other = newBase()
    lakeAt(other).writeAtomic(spark.range(3).toDF("id"), "s2")
    LakeSql.sql(spark,
      s"CREATE TABLE lake.`$base`.x SHALLOW CLONE lake.`$other`.s2")
      .collect().head.getString(0) shouldBe "CLONE"
    lake.read("x").count() shouldBe 3L
    assert(manifestFiles(base, "x").forall(_.startsWith("base:")))
  }

  test("cross-base clone: zero copies, identical reads, DVs stay hidden") {
    val srcBase = newBase(); val dstBase = newBase()
    val srcLake = lakeAt(srcBase); val dstLake = lakeAt(dstBase)
    srcLake.writeAtomic(spark.range(100).select(col("id"),
      (col("id") % 7).as("k")), "docs")
    srcLake.setProperties("docs",
      Map("lake.enableDeletionVectors" -> "true"))
    srcLake.deleteWhereDv("docs", col("id") < 10).rewrittenFiles shouldBe 0
    dstLake.cloneFrom(srcBase, "docs", "fork")
    // zero data files under the fork; refs are absolute base: form
    dataFilesUnder(dstBase, "fork") shouldBe empty
    assert(manifestFiles(dstBase, "fork").nonEmpty)
    assert(manifestFiles(dstBase, "fork").forall(_.startsWith("base:")))
    // DV-deleted rows stay hidden through the cross-base refs
    dstLake.read("fork").count() shouldBe 90L
    dstLake.read("fork").agg(sum("id")).as[Long].head() shouldBe 4905L
    // metadata-only count agrees (payload keys resolve through base:)
    dstLake.metadataRowCount("fork") shouldBe Some(90L)
    // stats pruning carried across: a selective predicate still prunes
    dstLake.readWhere("fork", col("id") === 50L)
      .as[(Long, Long)].collect() shouldBe Array((50L, 1L))
    // independent evolution: a rewrite-delete on the fork localizes it
    dstLake.deleteWhere("fork", col("k") === 3)
    dstLake.read("fork").count() shouldBe 77L
    srcLake.read("docs").count() shouldBe 90L
  }

  test("cross-base clone: scheme-qualified (file:///) source base — refs " +
      "split at the LAST //, never inside the scheme") {
    // a scheme-qualified root contains `//` right after the scheme; a
    // first-`//` split would mangle every resolved path and register the
    // vacuum pin under a bogus root
    val srcLocal = newBase()
    val srcBase = "file://" + srcLocal
    val dstBase = newBase()
    val srcLake = lakeAt(srcBase); val dstLake = lakeAt(dstBase)
    srcLake.writeAtomic(spark.range(100).select(col("id"),
      (col("id") % 7).as("k")), "docs")
    val v1 = srcLake.listVersions("docs").head
    dstLake.cloneFrom(srcBase, "docs", "fork")
    dataFilesUnder(dstBase, "fork") shouldBe empty
    val refs = manifestFiles(dstBase, "fork")
    assert(refs.nonEmpty && refs.forall(_.startsWith("base:file://")))
    // reads resolve through the scheme-qualified root
    dstLake.read("fork").count() shouldBe 100L
    dstLake.read("fork").agg(sum("id")).as[Long].head() shouldBe 4950L
    // the vacuum pin landed under the TRUE source layer root
    // exactly one pin under the TRUE source layer root (filter the
    // Hadoop local-FS .crc sidecars)
    assert(java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$srcLocal/docs/_CLONE_PINS"))
      .filter(p => !p.getFileName.toString.startsWith("."))
      .count() == 1L)
    // and the pin actually protects: bury v1, vacuum hard, v1 survives
    srcLake.writeAtomic(spark.range(5).toDF("id"), "docs")
    srcLake.vacuum("docs", keep = 1, orphanGraceMs = 0L)
    assert(srcLake.listVersions("docs").contains(v1))
    dstLake.read("fork").count() shouldBe 100L
  }

  test("cross-base clone: source vacuum pins referenced versions " +
      "(_CLONE_PINS), reclaims after the fork materializes") {
    val srcBase = newBase(); val dstBase = newBase()
    val srcLake = lakeAt(srcBase); val dstLake = lakeAt(dstBase)
    srcLake.writeAtomic(spark.range(50).toDF("id"), "docs")
    val v1 = srcLake.listVersions("docs").head
    dstLake.cloneFrom(srcBase, "docs", "fork")
    // bury v1 under FULL overwrites, then vacuum hard at the source
    srcLake.writeAtomic(spark.range(10).toDF("id"), "docs")
    srcLake.writeAtomic(spark.range(5).toDF("id"), "docs")
    srcLake.vacuum("docs", keep = 1, orphanGraceMs = 0L)
    // v1 survived: the cross-base pin walk found the fork's manifest
    assert(srcLake.listVersions("docs").contains(v1))
    dstLake.read("fork").count() shouldBe 50L
    // materialize the fork, retire its clone manifest, then the source
    // CAN reclaim
    dstLake.compact("fork")
    assert(manifestFiles(dstBase, "fork")
      .forall(!_.startsWith("base:")))
    dstLake.vacuum("fork", keep = 1, orphanGraceMs = 0L)
    srcLake.vacuum("docs", keep = 1, orphanGraceMs = 0L)
    assert(!srcLake.listVersions("docs").contains(v1))
    dstLake.read("fork").count() shouldBe 50L
    // clone-side vacuum never touched the source
    srcLake.read("docs").count() shouldBe 5L
  }
}
