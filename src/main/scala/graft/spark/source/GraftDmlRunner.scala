package graft.spark.source

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions.{col, lit, monotonically_increasing_id, when}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.spark.EncodeJob

/** Executes analyzed SQL UPDATE / MERGE INTO plans against graft tables
  * through the engine's rewrite machinery. Shares the crash-safety and
  * time-travel story of every other rewrite: the new batch is invisible
  * until its compaction record lands, `VERSION AS OF` before the DML
  * still sees the old rows until vacuum.
  *
  * The reference has no DML at all (write-once ORC files,
  * /root/reference/src/ApacheOrcDotNet/OrcWriter.cs); this is the
  * table-service layer a warehouse user expects on top.
  */
object GraftDmlRunner {

  private def noSubqueries(label: String, es: Iterable[Expression]): Unit =
    es.foreach { e =>
      require(!e.exists(_.isInstanceOf[PlanExpression[_]]),
        s"graft $label does not support subqueries in conditions/assignments yet; " +
          "materialize the subquery into a source table and use MERGE INTO")
    }

  /** Resolved target-side expressions are re-bound by NAME so they can
    * run over the freshly-decoded frame inside the rewrite (whose
    * attribute ids differ from the scan the analyzer resolved against).
    * Safe because graft schemas are flat and column names unique.
    */
  private def byName(e: Expression): Column =
    Bridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    })

  /** SQL UPDATE: selective batch rewrite via EncodeJob.updateWhere (only
    * batches whose stats admit the condition are decoded/re-encoded).
    */
  def update(table: GraftTable, u: UpdateTable): Unit = {
    val spark = SparkSession.active
    val dir = table.dir
    noSubqueries("UPDATE", u.condition ++ u.assignments.map(_.value))
    val cond = u.condition.map(byName).getOrElse(lit(true))
    val assigns = u.assignments.map { a =>
      val name = a.key match {
        case ar: AttributeReference => ar.name
        case other => throw new UnsupportedOperationException(
          s"graft UPDATE supports top-level column assignments only, got $other")
      }
      name -> byName(a.value)
    }.toMap
    EncodeJob.updateWhere(spark, dir, cond, assigns, table.dmlPartitions(spark))
  }

  /** SQL DELETE, strategy route: unlike the SupportsDeleteV2 surface
    * (which must refuse conditions without a lossless V1 translation),
    * the rewrite engine evaluates the RESOLVED expression exactly, so
    * UDFs/functions in the WHERE clause work. Same selective batch
    * pruning (translatable conjuncts still prune via chunk stats), same
    * atomic commit, same SQL null semantics (condition-NULL rows kept).
    */
  def delete(table: GraftTable, d: DeleteFromTable): Unit = {
    val spark = SparkSession.active
    noSubqueries("DELETE", Seq(d.condition))
    EncodeJob.deleteWhere(spark, table.dir, byName(d.condition), table.dmlPartitions(spark))
  }

  /** SQL MERGE INTO, copy-on-write: the merged result is computed over
    * the live table (resolved expressions composed directly over the
    * analyzer's own plans, so ids line up), encoded as one new batch,
    * and swapped in atomically for every visible batch. A full rewrite
    * by design — matched rows can live anywhere; at 100 TB run MERGE in
    * key-aligned waves or pre-filter the source. Semantics follow SQL:
    * first matching clause wins, unmatched-target rows pass through
    * unchanged (unless a NOT MATCHED BY SOURCE clause says otherwise),
    * and a target row matching multiple source rows is an error when
    * any MATCHED/NOT MATCHED BY SOURCE clause exists.
    */
  def merge(table: GraftTable, m: MergeIntoTable): Unit = {
    val spark = SparkSession.active
    val dir = table.dir
    require(!m.withSchemaEvolution, "graft MERGE does not support WITH SCHEMA EVOLUTION")
    val allActions = m.matchedActions ++ m.notMatchedActions ++ m.notMatchedBySourceActions
    noSubqueries("MERGE", Seq(m.mergeCondition) ++ allActions.flatMap {
      case a: UpdateAction => a.condition.toSeq ++ a.assignments.map(_.value)
      case a: DeleteAction => a.condition.toSeq
      case a: InsertAction => a.condition.toSeq ++ a.assignments.map(_.value)
      case other => throw new UnsupportedOperationException(
        s"graft MERGE does not support action $other (star actions must be " +
          "expanded by the analyzer)")
    })

    val targetAttrs: Seq[Attribute] = m.targetTable.output
    val tid = "__graft_merge_tid"
    // the tag makes target rows identifiable across the three branches
    // and pins match cardinality; persisted so every branch sees the
    // same ids (and the join runs once per branch off memory/disk, not
    // three times off the table)
    val target = Bridge.ofRows(spark, m.targetTable)
      .withColumn(tid, monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cachedPairs: Option[DataFrame] = None
    try {
      val source = Bridge.ofRows(spark, m.sourceTable)
      val cond = Bridge.column(m.mergeCondition)

      def actionCond(c: Option[Expression]): Column = c.map(Bridge.column).getOrElse(lit(true))
      def assignedValue(attr: Attribute, assignments: Seq[Assignment]): Column =
        assignments.collectFirst {
          case as if as.key.semanticEquals(attr) => Bridge.column(as.value)
        }.getOrElse(Bridge.column(attr))

      /** First-matching-clause-wins CASE chain over UPDATE/DELETE
        * actions: per-column value + a keep flag (false = row deleted).
        */
      def applyActions(rows: DataFrame, actions: Seq[MergeAction]): DataFrame = {
        val keep = actions.foldRight(lit(true)) { (a, els) =>
          a match {
            case d: DeleteAction => when(actionCond(d.condition), lit(false)).otherwise(els)
            case u: UpdateAction => when(actionCond(u.condition), lit(true)).otherwise(els)
            case other => throw new UnsupportedOperationException(
              s"unexpected MERGE action $other in a target-row clause")
          }
        }
        val values = targetAttrs.map { attr =>
          actions.foldRight(Bridge.column(attr)) { (a, els) =>
            a match {
              case u: UpdateAction =>
                when(actionCond(u.condition), assignedValue(attr, u.assignments)).otherwise(els)
              case d: DeleteAction =>
                when(actionCond(d.condition), Bridge.column(attr)).otherwise(els)
              case other => throw new UnsupportedOperationException(other.toString)
            }
          }.as(attr.name)
        }
        rows.select(values :+ keep.as("__graft_keep"): _*)
          .filter(col("__graft_keep")).drop("__graft_keep")
      }

      // matched pairs — cardinality checked when any target-row clause
      // could apply twice to the same target row. The pairs are persisted
      // across check and rewrite, so the inner join executes ONCE: the
      // check job reads the cache the rewrite will reuse, instead of
      // re-running the join for a throwaway aggregate (guide §1.2: don't
      // compute things twice). The check itself shuffles only (tid, count)
      // partials, never the payload columns.
      val matchedOut =
        if (m.matchedActions.isEmpty)
          // no matched clause: matched target rows pass through unchanged
          target.join(source, cond, "left_semi")
            .select(targetAttrs.map(a => Bridge.column(a).as(a.name)): _*)
        else {
          val pairs = target.join(source, cond, "inner")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          cachedPairs = Some(pairs)
          val dup = pairs.groupBy(col(tid)).count()
            .filter(col("count") > 1).limit(1).count() > 0
          require(!dup,
            "MERGE cardinality violation: a target row matched more than one source row")
          applyActions(pairs, m.matchedActions)
        }

      val unmatchedTarget = target.join(source, cond, "left_anti")
      val unmatchedOut =
        if (m.notMatchedBySourceActions.isEmpty)
          unmatchedTarget.select(targetAttrs.map(a => Bridge.column(a).as(a.name)): _*)
        else applyActions(unmatchedTarget, m.notMatchedBySourceActions)

      val insertOut = {
        val unmatchedSource = source.join(target, cond, "left_anti")
        val inserts = m.notMatchedActions.collect { case i: InsertAction => i }
        if (inserts.isEmpty) None
        else {
          val keep = inserts.foldRight(lit(false)) { (a, els) =>
            when(actionCond(a.condition), lit(true)).otherwise(els)
          }
          val values = targetAttrs.map { attr =>
            inserts.foldRight(lit(null).cast(attr.dataType): Column) { (a, els) =>
              when(actionCond(a.condition), assignedValue(attr, a.assignments)).otherwise(els)
            }.as(attr.name)
          }
          Some(unmatchedSource.select(values :+ keep.as("__graft_keep"): _*)
            .filter(col("__graft_keep")).drop("__graft_keep"))
        }
      }

      val schema = EncodeJob.schemaFromDisk(spark, dir).getOrElse(
        throw new IllegalStateException(s"no schema.json under $dir — cannot MERGE"))
      def conform(df: DataFrame): DataFrame =
        df.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
      val result = (Seq(matchedOut, unmatchedOut) ++ insertOut.toSeq)
        .map(conform).reduce(_ unionByName _)
      // MERGE into an EMPTY table (the upsert-bootstrap case) has nothing
      // to replace — the result (inserts only) appends as a normal batch
      if (EncodeJob.committedBatches(spark, dir).isEmpty)
        GraftWriteSupport.insert(result, dir, table.writeOptions, overwrite = false)
      else
        EncodeJob.rewriteVisibleWith(spark, dir, table.dmlPartitions(spark), result)
    } finally {
      cachedPairs.foreach(_.unpersist())
      target.unpersist()
    }
  }
}
