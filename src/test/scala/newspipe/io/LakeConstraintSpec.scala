package newspipe.io

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** CHECK constraints: add-time validation of existing data, commit-time
  * validation of every increment (and only the increment), standard-SQL
  * NULL-passes semantics, and the ALTER TABLE statement surface.
  */
class LakeConstraintSpec extends SparkTestBase {
  import spark.implicits._

  private def freshLake(): Lake = {
    val lake = new Lake(spark,
      LakeConfig(basePath = Files.createTempDirectory("lake_ck").toString))
    lake.writeAtomic((1 to 100).map(i => (i.toLong, i * 10L))
      .toDF("id", "n").repartitionByRange(4, $"id"), "docs")
    lake
  }

  test("addConstraint validates existing data and registers the rule") {
    val lake = freshLake()
    lake.addConstraint("docs", "pos_n", "n > 0")
    lake.constraints("docs") shouldBe Map("pos_n" -> "n > 0")
    // a constraint the existing data violates is refused with an example
    val ex = intercept[IllegalArgumentException] {
      lake.addConstraint("docs", "big_n", "n > 500")
    }
    ex.getMessage should include("big_n")
    lake.constraints("docs").keySet shouldBe Set("pos_n")
    // duplicate names are refused
    an[IllegalArgumentException] should be thrownBy
      lake.addConstraint("docs", "pos_n", "n > 1")
  }

  test("every write path gates its increment; valid commits pass") {
    val lake = freshLake()
    lake.addConstraint("docs", "pos_n", "n > 0")
    // append
    an[IllegalArgumentException] should be thrownBy
      lake.appendAtomic(Seq((200L, -1L)).toDF("id", "n"), "docs")
    lake.appendAtomic(Seq((200L, 5L)).toDF("id", "n"), "docs")
    // update
    an[IllegalArgumentException] should be thrownBy
      lake.updateWhere("docs", $"id" === 1L, Map("n" -> lit(-5L)))
    lake.updateWhere("docs", $"id" === 1L, Map("n" -> lit(7L)))
    // merge
    an[IllegalArgumentException] should be thrownBy
      lake.mergeInto("docs", Seq((2L, 0L)).toDF("id", "n"), Seq("id"))
    lake.mergeInto("docs", Seq((2L, 2L)).toDF("id", "n"), Seq("id"))
    // overwrite
    an[IllegalArgumentException] should be thrownBy
      lake.writeAtomic(Seq((1L, -1L)).toDF("id", "n"), "docs")
    // deletes never violate (they only remove rows)
    lake.deleteWhere("docs", $"id" === 3L)
    lake.read("docs").filter($"n" <= 0).count() shouldBe 0
    lake.read("docs").filter($"id" === 1L).select("n").as[Long]
      .head() shouldBe 7L
  }

  test("NULL conditions pass (standard CHECK); drop restores free writes") {
    val lake = freshLake()
    lake.addConstraint("docs", "pos_n", "n > 0")
    // NULL n → condition NULL → passes
    lake.appendAtomic(Seq((300L, Option.empty[Long]))
      .toDF("id", "n"), "docs")
    lake.read("docs").filter($"n".isNull).count() shouldBe 1
    // drop, then a violating append is accepted
    lake.dropConstraint("docs", "pos_n")
    lake.constraints("docs") shouldBe Map.empty
    lake.appendAtomic(Seq((301L, -9L)).toDF("id", "n"), "docs")
    // missing name is loud; ifExists is silent
    a[NoSuchElementException] should be thrownBy
      lake.dropConstraint("docs", "nope")
    lake.dropConstraint("docs", "nope", ifExists = true)
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT statement surface") {
    val lake = freshLake()
    val dir = Files.createTempDirectory("lake_ck_sql").toString
    val sqlLake = new Lake(spark, LakeConfig(basePath = dir))
    sqlLake.writeAtomic((1 to 50).map(i => (i.toLong, i * 10L))
      .toDF("id", "n").repartitionByRange(2, $"id"), "docs")
    val m = LakeSql.sql(spark,
      s"ALTER TABLE lake.`$dir`.docs ADD CONSTRAINT pos_n CHECK (n > 0)")
      .collect().head
    m.getString(0) shouldBe "ADD CONSTRAINT"
    m.getString(1) shouldBe "pos_n CHECK (n > 0)"
    // the UPDATE statement now gates through the same rule
    an[Exception] should be thrownBy LakeSql.sql(spark,
      s"UPDATE lake.`$dir`.docs SET n = -1 WHERE id = 5")
    LakeSql.sql(spark, s"UPDATE lake.`$dir`.docs SET n = 55 WHERE id = 5")
    val d = LakeSql.sql(spark,
      s"ALTER TABLE lake.`$dir`.docs DROP CONSTRAINT pos_n").collect().head
    d.getString(0) shouldBe "DROP CONSTRAINT"
    LakeSql.sql(spark, s"UPDATE lake.`$dir`.docs SET n = -1 WHERE id = 5")
    sqlLake.read("docs").filter($"id" === 5L).select("n").as[Long]
      .head() shouldBe -1L
    lake.constraints("docs") shouldBe Map.empty // unrelated layer untouched
  }

  // ---- v2 constraint surface (Spark 4's Constraint framework) ------------

  test("CREATE TABLE with table constraints: CHECK enforces, PRIMARY " +
      "KEY NOT ENFORCED records informationally; constraints() reports " +
      "both back") {
    val dir = Files.createTempDirectory("lake_ck_v2").toString
    spark.conf.set("spark.sql.catalog.ckcat", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.ckcat.basePath", dir)
    spark.sql(
      """CREATE TABLE ckcat.t (
        |  id BIGINT, n BIGINT,
        |  CONSTRAINT n_pos CHECK (n > 0),
        |  CONSTRAINT pk PRIMARY KEY (id) NOT ENFORCED
        |)""".stripMargin)
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    // PRIMARY KEY implies NOT NULL on its column (Spark's analysis) — the
    // catalog's usual NOT-NULL-as-CHECK rule picks that up alongside
    lake.constraints("t") shouldBe
      Map("n_pos" -> "n > 0", "notnull_id" -> "`id` IS NOT NULL")
    lake.properties("t").get("lake.constraintInfo.pk") shouldBe
      Some("PRIMARY KEY|id|false")
    // the CHECK really enforces
    spark.sql("INSERT INTO ckcat.t VALUES (1, 5)")
    an[Exception] should be thrownBy
      spark.sql("INSERT INTO ckcat.t VALUES (2, -1)")
    spark.sql("SELECT count(*) AS n FROM ckcat.t").as[Long]
      .head() shouldBe 1L
    // report-back through the v2 Table surface
    import org.apache.spark.sql.connector.catalog.{Identifier,
      TableCatalog}
    val cat = spark.sessionState.catalogManager.catalog("ckcat")
      .asInstanceOf[TableCatalog]
    val cons = cat.loadTable(Identifier.of(Array.empty, "t")).constraints()
    cons.map(_.name()).sorted.toSeq shouldBe
      Seq("n_pos", "notnull_id", "pk")
    val pk = cons.find(_.name() == "pk").get
    pk.enforced() shouldBe false
    pk.toDDL should include("PRIMARY KEY")
  }

  test("v2 ALTER TABLE ADD/DROP CONSTRAINT; enforced key constraints " +
      "refuse loudly") {
    val dir = Files.createTempDirectory("lake_ck_v2b").toString
    spark.conf.set("spark.sql.catalog.ckcatb", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.ckcatb.basePath", dir)
    spark.sql("CREATE TABLE ckcatb.t (id BIGINT, n BIGINT)")
    spark.sql("INSERT INTO ckcatb.t VALUES (1, 5)")
    spark.sql("ALTER TABLE ckcatb.t ADD CONSTRAINT n_pos CHECK (n > 0)")
    an[Exception] should be thrownBy
      spark.sql("INSERT INTO ckcatb.t VALUES (2, -7)")
    // adding a CHECK the existing data violates is refused
    an[Exception] should be thrownBy spark.sql(
      "ALTER TABLE ckcatb.t ADD CONSTRAINT n_small CHECK (n < 3)")
    spark.sql("ALTER TABLE ckcatb.t DROP CONSTRAINT n_pos")
    spark.sql("INSERT INTO ckcatb.t VALUES (2, -7)")
    spark.sql("SELECT count(*) AS n FROM ckcatb.t").as[Long]
      .head() shouldBe 2L
    // FK records informationally; UNIQUE must be NOT ENFORCED
    spark.sql("ALTER TABLE ckcatb.t ADD CONSTRAINT fk FOREIGN KEY (id) " +
      "REFERENCES ckcatb.other (id) NOT ENFORCED")
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    lake.properties("t").keys should contain("lake.constraintInfo.fk")
  }

  test("constraint info encoding round-trips across kinds, rely flags, " +
      "multi-column keys and pipe-bearing predicates") {
    import org.apache.spark.sql.connector.catalog.Identifier
    import org.apache.spark.sql.connector.catalog.constraints._
    import org.apache.spark.sql.connector.expressions.Expressions
    def roundtrip(c: Constraint): Constraint = {
      val (k, v) = LakeConstraints.toProperty(c)
      k should startWith(LakeConstraints.InfoPrefix)
      LakeConstraints.fromInfoProperty(
        k.stripPrefix(LakeConstraints.InfoPrefix), v)
    }
    for (rely <- Seq(true, false)) {
      val pk = Constraint.primaryKey("pk1",
          Array(Expressions.column("a"), Expressions.column("b")))
        .enforced(false).rely(rely)
        .validationStatus(Constraint.ValidationStatus.UNVALIDATED).build()
      val pkBack = roundtrip(pk).asInstanceOf[PrimaryKey]
      pkBack.columns.map(_.describe).toSeq shouldBe Seq("a", "b")
      pkBack.rely shouldBe rely
      val u = Constraint.unique("u1", Array(Expressions.column("x")))
        .enforced(false).rely(rely)
        .validationStatus(Constraint.ValidationStatus.UNVALIDATED).build()
      roundtrip(u).asInstanceOf[Unique]
        .columns.map(_.describe).toSeq shouldBe Seq("x")
      val fk = Constraint.foreignKey("fk1",
          Array(Expressions.column("cust")),
          Identifier.of(Array("ns"), "dim"),
          Array(Expressions.column("id")))
        .enforced(false).rely(rely)
        .validationStatus(Constraint.ValidationStatus.UNVALIDATED).build()
      val fkBack = roundtrip(fk).asInstanceOf[ForeignKey]
      fkBack.referencedTable.name shouldBe "dim"
      fkBack.referencedColumns.map(_.describe).toSeq shouldBe Seq("id")
      // a referenced-identifier part holding a literal '.' must survive
      // the encoding as ONE part, not mis-split into namespace levels
      val fkDot = Constraint.foreignKey("fk2",
          Array(Expressions.column("cust")),
          Identifier.of(Array("v2.1"), "dim.events"),
          Array(Expressions.column("id")))
        .enforced(false).rely(rely)
        .validationStatus(Constraint.ValidationStatus.UNVALIDATED).build()
      val fkDotBack = roundtrip(fkDot).asInstanceOf[ForeignKey]
      fkDotBack.referencedTable.namespace.toSeq shouldBe Seq("v2.1")
      fkDotBack.referencedTable.name shouldBe "dim.events"
      // a '|' in any referenced-identifier part would shift the stored
      // fields (rely would parse from the wrong slot) — refused loudly
      val fkPipe = Constraint.foreignKey("fk3",
          Array(Expressions.column("cust")),
          Identifier.of(Array("ns"), "bad|name"),
          Array(Expressions.column("id")))
        .enforced(false).rely(rely)
        .validationStatus(Constraint.ValidationStatus.UNVALIDATED).build()
      an[IllegalArgumentException] should be thrownBy
        LakeConstraints.toProperty(fkPipe)
      for (pred <- Seq("a || b = 'x|y'", "n > 0", "x IS NOT NULL")) {
        val ck = Constraint.check("ck1").predicateSql(pred)
          .enforced(false).rely(rely)
          .validationStatus(Constraint.ValidationStatus.UNVALIDATED)
          .build()
        roundtrip(ck).asInstanceOf[Check].predicateSql() shouldBe pred
      }
    }
  }

  test("NOT ENFORCED CHECK is informational and its predicate survives " +
      "the encoding even when it contains '||'") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog,
      TableChange}
    import org.apache.spark.sql.connector.catalog.constraints.Constraint
    val dir = Files.createTempDirectory("lake_ck_v2c").toString
    spark.conf.set("spark.sql.catalog.ckcatc", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.ckcatc.basePath", dir)
    spark.sql("CREATE TABLE ckcatc.t (a STRING, b STRING)")
    val cat = spark.sessionState.catalogManager.catalog("ckcatc")
      .asInstanceOf[TableCatalog]
    val ident = Identifier.of(Array.empty, "t")
    val pred = "a || b != 'xy'"
    cat.alterTable(ident, TableChange.addConstraint(
      Constraint.check("concat_rule").predicateSql(pred)
        .enforced(false).rely(true)
        .validationStatus(Constraint.ValidationStatus.UNVALIDATED).build(),
      null))
    // recorded on the layer with the predicate intact ('||' survives the
    // pipe encoding), and the decode round-trips
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    val recorded = lake.properties("t")("lake.constraintInfo.concat_rule")
    val decoded = LakeConstraints
      .fromInfoProperty("concat_rule", recorded)
      .asInstanceOf[org.apache.spark.sql.connector.catalog
        .constraints.Check]
    decoded.predicateSql() shouldBe pred
    decoded.enforced() shouldBe false
    decoded.rely() shouldBe true
    // NOT reported through constraints(): Spark's v2 write path would
    // inject enforcement for any reported Check, violating NOT ENFORCED
    cat.loadTable(ident).constraints()
      .exists(_.name == "concat_rule") shouldBe false
    // informational: a violating insert is NOT blocked
    spark.sql("INSERT INTO ckcatc.t VALUES ('x', 'y')")
    spark.sql("SELECT count(*) AS n FROM ckcatc.t").as[Long]
      .head() shouldBe 1L
  }
}
