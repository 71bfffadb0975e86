package newspipe.io

import org.apache.spark.sql.{DataFrame, NewspipeSqlBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, IntegerType, StringType}

/** SQL DML statements for the lake's row ops — the surface a Delta user
  * types first:
  *
  * {{{
  * DELETE FROM lake.`/lake/root`.docs WHERE lang = 'en' AND n_chars < 300
  * UPDATE lake.`/lake/root`.docs SET n_chars = n_chars * 2 WHERE n_chars >= 500
  * MERGE INTO lake.`/lake/root`.docs AS t USING updates AS s
  *   ON t.doc_id = s.doc_id
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * No grammar is hand-rolled: Spark's OWN parser already turns these
  * statements into `DeleteFromTable` / `UpdateTable` / `MergeIntoTable`
  * logical plans (they normally die in analysis with "only supported with
  * v2 tables"); [[LakeSql.translate]] recognizes the ones whose target is
  * the three-part identifier `lake`.`<basePath>`.`<layer>` and rewrites
  * them to a runnable command dispatching to [[Lake.deleteWhere]] /
  * [[Lake.updateWhere]] / [[Lake.mergeInto]] — so every row-op guarantee
  * (stats-pruned rewrite-only-matching-files, parent-checked atomic
  * commit, schema-evolution arbitration) holds identically for the SQL
  * and the Scala form.
  *
  * Two ways in:
  *  - sessions built with `spark.sql.extensions=newspipe.NewspipeExtensions`
  *    (or [[org.apache.spark.sql.NewspipeSqlBridge.sessionWithExtensions]])
  *    get the injected parser: plain `spark.sql("DELETE FROM lake. …")`.
  *  - [[LakeSql.sql]] runs the same translation against ANY live session
  *    (parser injection only applies at session build).
  *
  * MERGE supports the `WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED
  * THEN INSERT *` form (the [[Lake.mergeInto]] contract) with an ON clause
  * of ANDed key equalities, plus Spark 4's `MERGE WITH SCHEMA EVOLUTION
  * INTO` prefix for [[Lake.mergeInto]]'s `allowSchemaEvolution`. Richer
  * clause forms (conditional actions, DELETE actions, non-equi ON) are
  * refused loudly — never silently approximated.
  *
  * Each statement returns one metrics row `(operation, rewritten_files,
  * carried_files, noop)` — the RowOpResult, SQL-visible like Delta's
  * operation metrics.
  */
object LakeSql {

  /** A recognized lake DML statement, carried UNRESOLVED (expressions and
    * the merge source resolve at command run time, against the session
    * that executes — not the one that parsed).
    */
  sealed trait LakeDml { def base: String; def layer: String }
  final case class LakeDelete(base: String, layer: String,
      condition: Expression) extends LakeDml
  final case class LakeUpdate(base: String, layer: String,
      assignments: Seq[(String, Expression)],
      condition: Option[Expression]) extends LakeDml
  final case class LakeMerge(base: String, layer: String,
      source: LogicalPlan, keys: Seq[String],
      schemaEvolution: Boolean) extends LakeDml

  /** The `lake`.`<basePath>`.`<layer>` target of a DML plan, seen through
    * any alias.
    */
  private def lakeTarget(plan: LogicalPlan): Option[(String, String)] =
    plan match {
      case SubqueryAlias(_, child) => lakeTarget(child)
      case r: UnresolvedRelation => r.multipartIdentifier match {
        case Seq(cat, base, layer) if cat.equalsIgnoreCase("lake") =>
          Some((base, layer))
        case _ => None
      }
      case _ => None
    }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  /** Equi-key columns of a MERGE ON clause: ANDed `t.k = s.k` equalities
    * (in either order); anything else is refused — [[Lake.mergeInto]] is
    * keyed, and pretending a non-equi ON is a key would merge wrong rows.
    */
  private def mergeKeys(cond: Expression): Seq[String] =
    splitAnd(cond).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
          if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
        a.nameParts.last
      case other => throw new IllegalArgumentException(
        "lake MERGE supports an ON clause of ANDed key equalities " +
          s"(t.k = s.k); got: ${other.sql}")
    }.distinct

  /** Recognize a parsed DML plan targeting a lake layer. None = not ours
    * (the caller falls through to Spark's own analysis and its v2-table
    * error).
    */
  def translate(plan: LogicalPlan): Option[LakeDml] = plan match {
    case DeleteFromTable(target, condition) =>
      lakeTarget(target).map { case (b, l) => LakeDelete(b, l, condition) }
    case UpdateTable(target, assignments, condition) =>
      lakeTarget(target).map { case (b, l) =>
        LakeUpdate(b, l,
          assignments.map {
            case Assignment(k: UnresolvedAttribute, v) => k.nameParts.last -> v
            case Assignment(k, _) => throw new IllegalArgumentException(
              s"lake UPDATE assigns top-level columns; got: ${k.sql}")
          }, condition)
      }
    case m: MergeIntoTable =>
      lakeTarget(m.targetTable).map { case (b, l) =>
        val okMatched = m.matchedActions match {
          case Seq(UpdateStarAction(None)) => true
          case _ => false
        }
        val okNotMatched = m.notMatchedActions match {
          case Seq(InsertStarAction(None)) => true
          case _ => false
        }
        if (!okMatched || !okNotMatched || m.notMatchedBySourceActions.nonEmpty)
          throw new IllegalArgumentException(
            "lake MERGE supports exactly WHEN MATCHED THEN UPDATE SET * " +
              "and WHEN NOT MATCHED THEN INSERT * (no conditions, no " +
              "DELETE actions, no BY SOURCE clauses) — the keyed-upsert " +
              "contract of Lake.mergeInto")
        LakeMerge(b, l, m.sourceTable, mergeKeys(m.mergeCondition),
          m.withSchemaEvolution)
      }
    case _ => None
  }

  private[io] val metricsOutput: Seq[Attribute] = Seq(
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("rewritten_files", IntegerType, nullable = false)(),
    AttributeReference("carried_files", IntegerType, nullable = false)(),
    AttributeReference("noop", BooleanType, nullable = false)())

  /** Execute a translated statement against `session`. */
  def run(session: SparkSession, dml: LakeDml): Row = {
    val lake = new Lake(session, LakeConfig(basePath = dml.base))
    def asCol(e: Expression) = NewspipeSqlBridge.column(e)
    val (op, r) = dml match {
      case LakeDelete(_, layer, cond) =>
        "DELETE" -> lake.deleteWhere(layer, asCol(cond))
      case LakeUpdate(_, layer, assignments, cond) =>
        val pred = cond.map(asCol)
          .getOrElse(org.apache.spark.sql.functions.lit(true))
        "UPDATE" -> lake.updateWhere(layer, pred,
          assignments.map { case (k, v) => k -> asCol(v) }.toMap)
      case LakeMerge(_, layer, source, keys, evolve) =>
        "MERGE" -> lake.mergeInto(layer,
          NewspipeSqlBridge.dataFrame(session, source), keys,
          allowSchemaEvolution = evolve)
    }
    Row(op, r.rewrittenFiles, r.carriedFiles, r.noop)
  }

  /** Statement entry point for LIVE sessions (parser injection applies at
    * session build only): lake DML executes through [[run]], anything
    * else falls through to plain `spark.sql`.
    */
  def sql(spark: SparkSession, text: String): DataFrame = {
    translate(NewspipeSqlBridge.parsePlan(spark, text)) match {
      case Some(dml) =>
        val row = run(spark, dml)
        spark.createDataFrame(
          java.util.Arrays.asList(row),
          org.apache.spark.sql.types.StructType(
            metricsOutput.map(a => org.apache.spark.sql.types
              .StructField(a.name, a.dataType, a.nullable))))
      case None => spark.sql(text)
    }
  }
}

/** The runnable form the injected parser substitutes for a recognized lake
  * DML plan — `spark.sql("DELETE FROM lake. …")` executes this like any
  * other command (eagerly, returning the metrics row).
  */
final case class LakeDmlCommand(dml: LakeSql.LakeDml)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = LakeSql.metricsOutput
  override def run(session: SparkSession): Seq[Row] =
    Seq(LakeSql.run(session, dml))
}
