package org.apache.spark.sql.graftdml

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, MergeIntoTable, UpdateTable}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}

/** Planner strategy routing SQL `UPDATE` and `MERGE INTO` on graft
  * tables into the engine's atomic rewrite machinery
  * (EncodeJob.updateWhere / rewriteVisibleWith via GraftDmlRunner).
  *
  * Why a strategy and not `SupportsRowLevelOperations`: Spark's
  * group-based row-level path (`ReplaceData`) requires a row-at-a-time
  * V2 `BatchWrite`, while graft's write side is deliberately a V1
  * whole-DataFrame sink — reservoir codec pinning, global skew salting
  * and the single atomic manifest/compaction commit all need the whole
  * frame (see GraftWriteBuilder). Intercepting the ANALYZED command at
  * planning keeps those properties and still hands Spark the entire
  * resolution/alignment pipeline: by the time the strategy fires, the
  * assignments are aligned and cast, and the merge actions are
  * resolved against both sides. Analysis was verified to complete for
  * non-row-level tables; the stock planner then throws
  * UNSUPPORTED_FEATURE.TABLE_OPERATION — this strategy runs before it
  * (extraStrategies precede built-ins) and claims only graft tables.
  */
object GraftDmlStrategy extends SparkStrategy {

  private def graftTable(table: LogicalPlan): Option[graft.spark.source.GraftTable] = {
    // by planning time V2ScanRelationPushDown may have turned the
    // relation into a scan relation — accept both shapes
    val tbl = EliminateSubqueryAliases(table) match {
      case r: DataSourceV2Relation => Some(r.table)
      case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        Some(s.relation.table)
      case _ => None
    }
    tbl.collect { case g: graft.spark.source.GraftTable => g }
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case u: UpdateTable =>
      graftTable(u.table).map { tbl =>
        GraftDmlExec(s"GraftUpdate ${tbl.dir}",
          () => graft.spark.source.GraftDmlRunner.update(tbl, u)) :: Nil
      }.getOrElse(Nil)
    // with the extension registered, ALL graft deletes run through the
    // rewrite engine — including conditions the SupportsDeleteV2 path
    // must refuse (no lossless V1 translation: UDFs, functions over
    // columns, complex LIKEs), which would otherwise error. Vanilla
    // sessions (no extension) keep the SupportsDeleteV2 surface; both
    // routes share EncodeJob.deleteWhere, so semantics are identical.
    case d: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable =>
      graftTable(d.table).map { tbl =>
        GraftDmlExec(s"GraftDelete ${tbl.dir}",
          () => graft.spark.source.GraftDmlRunner.delete(tbl, d)) :: Nil
      }.getOrElse(Nil)
    case m: MergeIntoTable =>
      graftTable(m.targetTable).map { tbl =>
        GraftDmlExec(s"GraftMerge ${tbl.dir}",
          () => graft.spark.source.GraftDmlRunner.merge(tbl, m)) :: Nil
      }.getOrElse(Nil)
    case _ => Nil
  }
}

/** Leaf command node: UPDATE/MERGE are `Command`s, so QueryExecution
  * runs them eagerly through `executeCollect` exactly once; the work is
  * idempotent-guarded anyway in case the plan is re-executed.
  */
final case class GraftDmlExec(label: String, run: () => Unit) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil
  @transient private var done = false
  override def executeCollect(): Array[InternalRow] = synchronized {
    if (!done) { run(); done = true }
    Array.empty
  }
  override protected def doExecute(): RDD[InternalRow] = {
    executeCollect()
    sparkContext.emptyRDD
  }
  override def simpleString(maxFields: Int): String = label
}
