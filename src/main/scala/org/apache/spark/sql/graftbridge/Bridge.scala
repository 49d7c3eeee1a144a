package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 moved `Column` to a ColumnNode
  * facade and made the conversion (`ExpressionUtils`) private[sql]; this
  * subpackage exposes exactly the two conversions custom Catalyst
  * expressions need. Standard extension-library pattern.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Pin an already-planned RDD[InternalRow] as a DataFrame so downstream
    * operators compose on top WITHOUT re-planning the source (used to
    * freeze file-split decisions made under a temporary conf window).
    */
  def internalCreateDataFrame(spark: org.apache.spark.sql.SparkSession,
                              rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
                              schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Register a function into an EXISTING session's registry (the
    * extensions path only applies at session build time).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)

  /** V2 runtime-filter Predicates → V1 source Filters (unconvertible
    * predicates dropped — runtime pruning is advisory, the join re-checks
    * exact keys). `PredicateUtils` is private[sql]; same bridge pattern.
    */
  def predicatesToV1(ps: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Array[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(ps)

  /** DataFrame over an already-analyzed logical plan, preserving its
    * expression ids — the DML interception path composes resolved
    * UPDATE/MERGE expressions over the very plans they were resolved
    * against. `Dataset.ofRows` is private[sql].
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Catalyst predicate → V1 source Filter (None = untranslatable; the
    * caller treats it as unprunable, never as unmatchable). Drives
    * batch-level DML pruning through the same ChunkPrune machinery the
    * scan uses. `DataSourceStrategy` is private[sql].
    */
  def translateV1Filter(e: Expression): Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)

  /** Drain the listener bus so SparkListener-collected metrics (e.g.
    * bytes-read assertions in tests) are complete before reading them.
    * `listenerBus.waitUntilEmpty` is private[spark]; this is the same
    * org.apache.spark-package bridge pattern as the rest of this file.
    */
  def waitListenerBusEmpty(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
