package org.apache.spark.sql.graftext

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._

import graft.sources.SnapshotStore

/** Row-level SQL DML for graft snapshot tables — `UPDATE graft.t SET …`
  * and `MERGE INTO graft.t USING … ON …` — via a post-hoc resolution rule
  * that swaps the resolved logical command for a runnable one executing
  * over [[SnapshotStore]]'s rebase-retry commit protocol. This is the
  * published lakehouse architecture for engines whose write path predates
  * (or sidesteps) DSv2 row-level operations: intercept the ANALYZED
  * `UpdateTable`/`MergeIntoTable` (conditions and assignments fully
  * resolved against the relation's attributes), re-plan them as DataFrame
  * computations over those same resolved expressions, and commit
  * copy-on-write at PARTITION granularity ([[SnapshotStore.replaceWhere]]).
  * `DELETE FROM` needs none of this — it rides Spark's own
  * `SupportsDelete` path into [[SnapshotStore.delete]].
  *
  * Scale shape: both commands first compute the TOUCHED partitions (a
  * column-pruned scan of the partition column under the match predicate,
  * collected driver-side — bounded by partition count, never rows), then
  * rewrite only those partitions' content; every other partition's files
  * carry forward in the manifest. An unpartitioned table — or a MERGE
  * with NOT MATCHED BY SOURCE clauses, whose scope is inherently the
  * whole target — rewrites wholesale (the documented trade, same as the
  * Scala `delete` without a partition column). Inserted or re-partitioned
  * rows landing OUTSIDE the touched set are plain added files (append
  * semantics, never a conflict).
  *
  * Snapshot isolation: content is computed against the version the
  * analyzer resolved; the commit rebases over concurrent commits
  * elsewhere and conflicts loudly if they touched the replaced
  * partitions.
  */
class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan resolveOperators {
    case u @ UpdateTable(target, assignments, condition)
        if u.resolved && GraftDml.graftRelation(target).isDefined =>
      GraftUpdateCommand(target, assignments, condition)
    case m: MergeIntoTable
        if m.resolved && GraftDml.graftRelation(m.targetTable).isDefined =>
      if (m.withSchemaEvolution) throw new UnsupportedOperationException(
        "graft MERGE does not support WITH SCHEMA EVOLUTION; evolve the " +
          "schema first with SnapshotStore.append(evolveSchema = true)")
      GraftMergeCommand(m.targetTable, m.sourceTable, m.mergeCondition,
        m.matchedActions, m.notMatchedActions, m.notMatchedBySourceActions)
  }
}

private[graftext] object GraftDml {

  /** The graft snapshot relation under `plan` (stripping aliases), if any.
    * Identified by the provider property — the table class itself is
    * package-private to the sources package by design.
    */
  def graftRelation(plan: LogicalPlan): Option[DataSourceV2Relation] = plan match {
    case SubqueryAlias(_, child) => graftRelation(child)
    case r: DataSourceV2Relation
        if Option(r.table.properties.get("provider")).contains("graft-snapshot") =>
      Some(r)
    case _ => None
  }

  /** (location, baseVersion, partCol) of the resolved relation — all
    * carried in the table's DSv2 properties.
    */
  def tableMeta(plan: LogicalPlan): (String, Long, Option[String]) = {
    val props = graftRelation(plan).getOrElse(throw new IllegalStateException(
      s"not a graft snapshot relation: $plan")).table.properties
    (props.get("location"), props.get("snapshot-version").toLong,
      Option(props.get("partition-column")))
  }

  /** DataFrame over the RESOLVED plan — attribute ids are preserved, so
    * Columns built from the command's resolved expressions bind exactly.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def toColumn(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Assignments keyed by top-level target column name. Nested-field
    * assignments refuse loudly (a silent partial-struct write would be
    * data corruption, not a feature gap).
    */
  def assignmentMap(assignments: Seq[Assignment]): Map[String, Column] =
    assignments.map { a =>
      a.key match {
        case ar: AttributeReference => ar.name -> toColumn(a.value)
        case other => throw new UnsupportedOperationException(
          "graft DML supports top-level column assignments only; got " +
            other.sql)
      }
    }.toMap

  /** A clause condition as a row predicate: absent = always applies,
    * NULL-valued = does not apply (the SQL three-valued contract).
    */
  def clauseCond(c: Option[Expression]): Column =
    coalesce(c.map(toColumn).getOrElse(lit(true)), lit(false))
}

/** `UPDATE <graft table> SET assignments [WHERE condition]`, executed as
  * copy-on-write over the touched partitions. Assignments may change the
  * partition column: the row's old partition is rewritten (it loses the
  * row) and the new value lands as an added file wherever it falls.
  */
case class GraftUpdateCommand(target: LogicalPlan,
                              assignments: Seq[Assignment],
                              condition: Option[Expression])
  extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val (location, base, partCol) = GraftDml.tableMeta(target)
    val df = GraftDml.ofRows(spark, target)
    // NULL condition keeps the row un-updated (WHERE semantics).
    val matchPred = coalesce(
      condition.map(GraftDml.toColumn).getOrElse(lit(true)), lit(false))
    val assign = GraftDml.assignmentMap(assignments)
    val outCols = df.columns.toSeq.map { c =>
      when(matchPred, assign.getOrElse(c, col(c))).otherwise(col(c)).as(c)
    }
    partCol match {
      case Some(pc) =>
        // Touched partitions: column-pruned scan, driver list bounded by
        // partition count.
        val parts = df.filter(matchPred).select(col(pc)).distinct()
          .collect().map(_.get(0)).toSeq
        if (parts.nonEmpty)
          SnapshotStore.replaceWhere(spark, location, base,
            df.filter(SnapshotStore.partitionIn(pc, parts)).select(outCols: _*),
            Some(parts))
      case None =>
        if (!df.filter(matchPred).isEmpty)
          SnapshotStore.replaceWhere(spark, location, base,
            df.select(outCols: _*), None)
    }
    Seq.empty
  }
}

/** `MERGE INTO <graft table> t USING <source> s ON cond` with the full
  * clause matrix — WHEN MATCHED [AND c] THEN UPDATE/DELETE, WHEN NOT
  * MATCHED [AND c] THEN INSERT, WHEN NOT MATCHED BY SOURCE [AND c] THEN
  * UPDATE/DELETE — compiled into ONE full-outer join over the touched
  * partitions plus per-column CASE chains (first applicable clause wins,
  * rows no clause claims pass through), committed atomically.
  *
  * The ANSI cardinality rule is enforced: a target row matching more than
  * one source row under any WHEN MATCHED clause set fails the statement
  * (a separate bounded check over the matched pairs), because applying
  * two updates to one row is order-dependent nondeterminism.
  */
case class GraftMergeCommand(target: LogicalPlan,
                             source: LogicalPlan,
                             mergeCond: Expression,
                             matched: Seq[MergeAction],
                             notMatched: Seq[MergeAction],
                             notMatchedBySource: Seq[MergeAction])
  extends LeafRunnableCommand {

  private val TMark = "__graft_t"
  private val SMark = "__graft_s"
  private val Tid = "__graft_tid"

  /** (appliesCond, None=delete | Some(assignments)) for one clause. */
  private def clause(a: MergeAction): (Column, Option[Map[String, Column]]) =
    a match {
      case DeleteAction(c) => (GraftDml.clauseCond(c), None)
      case UpdateAction(c, asg, _) =>
        (GraftDml.clauseCond(c), Some(GraftDml.assignmentMap(asg)))
      case InsertAction(c, asg) =>
        (GraftDml.clauseCond(c), Some(GraftDml.assignmentMap(asg)))
      case other => throw new UnsupportedOperationException(
        s"unsupported MERGE action: $other")
    }

  /** Fold a clause list into (keepRow, value per column): first clause
    * whose condition holds wins; none → (defaultKeep, defaults).
    */
  private def branch(actions: Seq[MergeAction],
                     defaults: Map[String, Column],
                     defaultKeep: Column): (Column, Map[String, Column]) =
    actions.foldRight((defaultKeep, defaults)) {
      case (a, (keepElse, valsElse)) =>
        val (c, asg) = clause(a)
        val keep = when(c, asg.fold(lit(false))(_ => lit(true))).otherwise(keepElse)
        val vals = defaults.map { case (name, dflt) =>
          val thenV = asg.fold(dflt)(_.getOrElse(name, dflt))
          name -> when(c, thenV).otherwise(valsElse(name))
        }
        (keep, vals)
    }

  override def run(spark: SparkSession): Seq[Row] = {
    val (location, base, partCol) = GraftDml.tableMeta(target)
    val t0 = GraftDml.ofRows(spark, target)
    val s0 = GraftDml.ofRows(spark, source)
    Seq(TMark, SMark, Tid).foreach { m =>
      require(!t0.columns.contains(m) && !s0.columns.contains(m),
        s"MERGE reserves the column name $m")
    }
    val cond = GraftDml.toColumn(mergeCond)
    val tCols = t0.columns.toSeq

    // Touched-partition scope. NOT MATCHED BY SOURCE clauses act on every
    // unmatched target row, so their presence forces whole-table scope.
    val (tScoped, affected): (DataFrame, Option[Seq[Any]]) = partCol match {
      case Some(pc) if notMatchedBySource.isEmpty =>
        val parts = t0.join(s0, cond, "left_semi").select(col(pc)).distinct()
          .collect().map(_.get(0)).toSeq
        (t0.filter(SnapshotStore.partitionIn(pc, parts)), Some(parts))
      case _ => (t0, None)
    }
    if (affected.contains(Seq.empty) && notMatched.isEmpty)
      return Seq.empty // nothing matched, nothing to insert: a no-op

    val t = tScoped.withColumn(TMark, lit(true))
      .withColumn(Tid, monotonically_increasing_id())
    val s = s0.withColumn(SMark, lit(true))

    // ANSI cardinality: ambiguous multi-source matches fail the statement
    // before anything is written. Bounded: matched pairs only.
    if (matched.nonEmpty) {
      val dup = t.join(s, cond, "inner")
        .groupBy(col(Tid)).agg(count(lit(1)).as("__graft_n"))
        .filter(col("__graft_n") > 1)
      if (!dup.isEmpty) throw new IllegalStateException(
        "MERGE: a target row matched multiple source rows — the update/" +
          "delete is ambiguous (ANSI cardinality violation); deduplicate " +
          "the source on the merge key")
    }

    val joined = t.join(s, cond, "full_outer")
    val isMatched = col(TMark).isNotNull && col(SMark).isNotNull
    val isSourceOnly = col(TMark).isNull
    val tVals = target.output.map(a => a.name -> GraftDml.toColumn(a)).toMap
    val nullVals = t0.schema.fields
      .map(f => f.name -> lit(null).cast(f.dataType)).toMap
    val (keepM, valsM) = branch(matched, tVals, lit(true))
    val (keepI, valsI) = branch(notMatched, nullVals, lit(false))
    val (keepN, valsN) = branch(notMatchedBySource, tVals, lit(true))
    val keep = when(isMatched, keepM).when(isSourceOnly, keepI).otherwise(keepN)
    val outCols = tCols.map(c =>
      when(isMatched, valsM(c)).when(isSourceOnly, valsI(c)).otherwise(valsN(c)).as(c))
    SnapshotStore.replaceWhere(spark, location, base,
      joined.filter(keep).select(outCols: _*), affected)
    Seq.empty
  }
}
