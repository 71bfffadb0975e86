package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion for newspipe's
  * native Catalyst expressions (Spark 4 moved the classic converters behind
  * `private[sql]`; extension libraries reach them from this package — the
  * same access pattern SparkSessionExtensions-based projects use).
  */
object NewspipeSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER Column→Expression conversion. `ExpressionUtils.expression` wraps
    * the column node lazily (`ColumnNodeExpression`), which never resolves
    * when returned from a FunctionRegistry builder — the analyzer needs a
    * real (if still unresolved-function-bearing) expression tree, which the
    * classic converter produces and subsequent analyzer passes resolve.
    */
  def convertedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  def registerFunction(spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(ident, info, builder)

  /** The UNANALYZED logical plan of a composed DataFrame — what a
    * table-function builder must return so the outer query's analyzer
    * resolves the whole tree in one pass.
    */
  def logicalPlan(df: Dataset[_])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.logical

  /** Table-function registration (FROM-position functions returning a
    * relation) — same session-registry access pattern as
    * [[registerFunction]].
    */
  def registerTableFunction(spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.tableFunctionRegistry
      .registerFunction(ident, info, builder)

  /** A computed batch frame re-tagged `isStreaming = true` — what a DSv1
    * streaming `Source.getBatch` must return (MicroBatchExecution splices
    * the frame in place of the streaming relation and asserts streaming-
    * ness). Same access pattern as Delta's `createDataFrame(...,
    * isStreaming = true)`; the batch plan is materialized to an
    * InternalRow RDD first, exactly like the built-in file stream source.
    */
  def streamingDataFrame(df: Dataset[Row]): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
