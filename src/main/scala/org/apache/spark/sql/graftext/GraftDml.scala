package org.apache.spark.sql.graftext

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, ExprId, Expression}
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
  * computations, and commit. `DELETE FROM` needs none of this — it rides
  * Spark's own `SupportsDelete` path into [[SnapshotStore.delete]].
  *
  * Scale shape — MERGE-ON-READ at row granularity (the Delta-DV model):
  * both commands cost ∝ MATCHED rows, not touched-partition bytes. The
  * acted rows' old positions are masked by one deletion-vector sidecar
  * and their new images (plus MERGE inserts) append as new files, all in
  * ONE atomic commit ([[SnapshotStore.updateRows]]); every base data file
  * carries forward byte-untouched (mtime-proof spec-gated). An UPDATE
  * whose predicate is partition-aligned (references only the partition
  * column, or no predicate at all) takes the copy-on-write
  * [[SnapshotStore.replaceWhere]] path instead — when the whole partition
  * rewrites anyway, COW leaves no DV debt for later reads to pay.
  * [[SnapshotStore.compact]] materializes accumulated DVs back to plain
  * files.
  *
  * Snapshot isolation: content is computed against the version the
  * analyzer resolved; the commit rebases over concurrent commits
  * elsewhere. An UPDATE's read set is the acted rows' files (positions of
  * immutable files stay valid under concurrent appends); a MERGE with
  * matched / not-matched-by-source clauses read the WHOLE target (its
  * cardinality semantics saw every row), so any concurrent addition
  * conflicts; an insert-only MERGE rebases over concurrent appends (the
  * Delta WriteSerializable contract, documented anomaly included).
  */
class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan resolveOperators {
    case u @ UpdateTable(target, assignments, condition)
        if u.resolved && GraftDml.graftRelation(target).isDefined =>
      GraftUpdateCommand(target, assignments, condition)
    case m: MergeIntoTable
        if m.resolved && GraftDml.graftRelation(m.targetTable).isDefined =>
      // WITH SCHEMA EVOLUTION needs nothing here: the table declares
      // AUTOMATIC_SCHEMA_EVOLUTION, so Spark's own resolution rule
      // (ResolveMergeIntoSchemaEvolution) already routed the add-column/
      // widen changes through the catalog's atomic alterTable and swapped
      // in the reloaded relation — by post-hoc time this merge is
      // resolved against the EVOLVED schema and converts like any other.
      GraftMergeCommand(m.targetTable, m.sourceTable, m.mergeCondition,
        m.matchedActions, m.notMatchedActions, m.notMatchedBySourceActions)
  }
}

private[graftext] object GraftDml {

  /** Marker column: whether an acted row re-appends (update) or only
    * position-deletes (delete) — [[SnapshotStore.updateRows]]' keepCol.
    */
  val Keep = "__graft_keep"

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

  /** A resolved expression REBOUND BY NAME: every attribute reference is
    * replaced by an unresolved one carrying the name `names` assigns its
    * exprId, so the Column re-resolves against a DIFFERENT frame exposing
    * those names — the bridge from the analyzer's resolved relation to
    * the fresh [[SnapshotStore.positionScan]] the DV path computes over.
    * Attributes outside `names` (none, for a resolved DML command) pass
    * through untouched.
    */
  def rebind(e: Expression, names: Map[ExprId, String]): Column =
    toColumn(e.transform {
      case ar: AttributeReference if names.contains(ar.exprId) =>
        UnresolvedAttribute.quoted(names(ar.exprId))
    })

  /** Assignments keyed by top-level target column name. Nested-field
    * assignments refuse loudly (a silent partial-struct write would be
    * data corruption, not a feature gap).
    */
  def assignmentMap(assignments: Seq[Assignment],
                    names: Map[ExprId, String]): Map[String, Column] =
    assignments.map { a =>
      a.key match {
        case ar: AttributeReference => ar.name -> rebind(a.value, names)
        case other => throw new UnsupportedOperationException(
          "graft DML supports top-level column assignments only; got " +
            other.sql)
      }
    }.toMap

  /** A clause condition as a row predicate: absent = always applies,
    * NULL-valued = does not apply (the SQL three-valued contract).
    */
  def clauseCond(c: Option[Expression], names: Map[ExprId, String]): Column =
    coalesce(c.map(rebind(_, names)).getOrElse(lit(true)), lit(false))
}

/** `UPDATE <graft table> SET assignments [WHERE condition]`.
  *
  * Row-level predicates execute MERGE-ON-READ: one position scan finds
  * the matched rows, their old positions mask via a deletion-vector
  * sidecar, their updated images append — cost ∝ matched rows, base files
  * byte-untouched. Partition-aligned predicates (and the no-predicate
  * whole-table form) keep copy-on-write [[SnapshotStore.replaceWhere]]:
  * those rewrite the whole partition's rows anyway, so COW costs the same
  * write and leaves no DV debt. Either way assignments may change the
  * partition column — updated rows land as added files wherever their new
  * value falls.
  */
case class GraftUpdateCommand(target: LogicalPlan,
                              assignments: Seq[Assignment],
                              condition: Option[Expression])
  extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val (location, base, partCol) = GraftDml.tableMeta(target)
    val tNames = target.output.map(a => a.exprId -> a.name).toMap
    val condRefs = condition.map(_.references.map(_.name).toSet)
      .getOrElse(Set.empty[String])
    val partitionAligned = partCol match {
      case Some(pc) => condRefs.subsetOf(Set(pc))
      case None => condRefs.isEmpty // no predicate: whole-table rewrite
    }
    if (partitionAligned) {
      // COW path over the resolved relation (attribute ids bind exactly).
      val df = GraftDml.ofRows(spark, target)
      val matchPred = coalesce(
        condition.map(GraftDml.toColumn).getOrElse(lit(true)), lit(false))
      val assign = assignments.map { a =>
        a.key match {
          case ar: AttributeReference => ar.name -> GraftDml.toColumn(a.value)
          case other => throw new UnsupportedOperationException(
            "graft DML supports top-level column assignments only; got " +
              other.sql)
        }
      }.toMap
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
    } else {
      // Merge-on-read path: rebind the resolved predicate/assignments by
      // name onto the position scan (table column names are unique).
      val assign = GraftDml.assignmentMap(assignments, tNames)
      val pos = SnapshotStore.positionScan(spark, location, base)
      require(!tNames.values.exists(
        Set("__file", "__pos", GraftDml.Keep)),
        "UPDATE reserves the column names __file, __pos, __graft_keep")
      val pred = coalesce(
        condition.map(GraftDml.rebind(_, tNames)).getOrElse(lit(true)),
        lit(false))
      val tCols = target.output.map(_.name)
      val acted = pos.filter(pred).select(
        Seq(col("__file"), col("__pos"), lit(true).as(GraftDml.Keep)) ++
          tCols.map(c => assign.getOrElse(c, col(c)).as(c)): _*)
      SnapshotStore.updateRows(spark, location, base, acted, GraftDml.Keep)
    }
    Seq.empty
  }
}

/** `MERGE INTO <graft table> t USING <source> s ON cond` with the full
  * clause matrix — WHEN MATCHED [AND c] THEN UPDATE/DELETE, WHEN NOT
  * MATCHED [AND c] THEN INSERT, WHEN NOT MATCHED BY SOURCE [AND c] THEN
  * UPDATE/DELETE — executed MERGE-ON-READ:
  *
  *   - matched pairs come from ONE inner join of the position scan with
  *     the source; the first applicable clause decides act/keep/values
  *     (rows no clause claims are NOT touched — their files never
  *     rewrite, where the previous copy-on-write shape re-wrote every
  *     scoped row);
  *   - NOT MATCHED inserts come from a source-side anti join;
  *   - NOT MATCHED BY SOURCE rows from a target-side anti join;
  *   - everything commits atomically as one DV sidecar + one batch of
  *     appended files ([[SnapshotStore.updateRows]]).
  *
  * An insert-only MERGE (no matched / not-matched-by-source clauses) is
  * a pure anti-join append: target rows are never fanned out through a
  * join, so a source row matching N target rows — or N source rows
  * matching one target row — cannot duplicate target content (the ADVICE
  * r14 defect in the full-outer-join shape).
  *
  * The ANSI cardinality rule is enforced on the PHYSICAL row identity
  * (`__file`, `__pos` — stable under stage retry, unlike
  * monotonically_increasing_id): a target row matching more than one
  * source row under any WHEN MATCHED clause set fails the statement
  * before anything is written.
  */
case class GraftMergeCommand(target: LogicalPlan,
                             source: LogicalPlan,
                             mergeCond: Expression,
                             matched: Seq[MergeAction],
                             notMatched: Seq[MergeAction],
                             notMatchedBySource: Seq[MergeAction])
  extends LeafRunnableCommand {

  /** (appliesCond, None=delete | Some(assignments)) for one clause. */
  private def clause(a: MergeAction, names: Map[ExprId, String])
      : (Column, Option[Map[String, Column]]) =
    a match {
      case DeleteAction(c) => (GraftDml.clauseCond(c, names), None)
      case UpdateAction(c, asg, _) =>
        (GraftDml.clauseCond(c, names), Some(GraftDml.assignmentMap(asg, names)))
      case InsertAction(c, asg) =>
        (GraftDml.clauseCond(c, names), Some(GraftDml.assignmentMap(asg, names)))
      case other => throw new UnsupportedOperationException(
        s"unsupported MERGE action: $other")
    }

  /** Fold a clause list into (someClauseApplies, keepRow, value per
    * column): first clause whose condition holds wins; keep = the winning
    * clause is an update/insert (false = delete); none applies →
    * (false, false, defaults).
    */
  private def branch(actions: Seq[MergeAction],
                     defaults: Map[String, Column],
                     names: Map[ExprId, String])
      : (Column, Column, Map[String, Column]) =
    actions.foldRight((lit(false), lit(false), defaults)) {
      case (a, (appliedElse, keepElse, valsElse)) =>
        val (c, asg) = clause(a, names)
        val applied = when(c, lit(true)).otherwise(appliedElse)
        val keep = when(c, lit(asg.isDefined)).otherwise(keepElse)
        val vals = defaults.map { case (name, dflt) =>
          val thenV = asg.fold(dflt)(_.getOrElse(name, dflt))
          name -> when(c, thenV).otherwise(valsElse(name))
        }
        (applied, keep, vals)
    }

  override def run(spark: SparkSession): Seq[Row] = {
    val (location, base, _) = GraftDml.tableMeta(target)
    val tCols = target.output.map(_.name)
    Seq("__file", "__pos", GraftDml.Keep).foreach { m =>
      require(!tCols.contains(m), s"MERGE reserves the column name $m")
    }
    // Source columns re-expose under positional synthetic names so the
    // rebound expressions can never collide with target names (the usual
    // MERGE has identical column names on both sides) — exprId decides
    // which side an attribute reference meant, exactly as the analyzer
    // resolved it.
    val sNames = source.output.zipWithIndex
      .map { case (a, i) => a.exprId -> s"__graft_s$i" }.toMap
    val tNames = target.output.map(a => a.exprId -> a.name).toMap
    val names = sNames ++ tNames
    val sR = {
      val s0 = GraftDml.ofRows(spark, source)
      s0.select(source.output.zipWithIndex.map { case (a, i) =>
        GraftDml.toColumn(a).as(s"__graft_s$i") }: _*)
    }
    val cond = GraftDml.rebind(mergeCond, names)
    // The ON condition's target-side equi-join columns, recorded in the
    // commit manifest as its change key: changes() pairs this merge's
    // delete+insert rows into update_preimage/update_postimage images
    // for downstream incremental consumers (the Delta CDF contract).
    // Declared ONLY when EVERY conjunct is a target-source equi
    // comparison: a residual predicate (t.k=s.k AND t.x>5) means rows can
    // be inserted and deleted under the SAME key value in one commit
    // without being an update (the non-equi part decided matching), so
    // value-level pairing would mislabel them — such commits stay keyless
    // and changes() keeps plain insert/delete labels.
    val keyCols: Option[Seq[String]] = {
      def conjuncts(e: Expression): Seq[Expression] = e match {
        case And(l, r) => conjuncts(l) ++ conjuncts(r)
        case x => Seq(x)
      }
      val (tSet, sSet) = (target.outputSet, source.outputSet)
      val perConjunct = conjuncts(mergeCond).map {
        case EqualTo(l: AttributeReference, r: AttributeReference)
            if tSet.contains(l) && sSet.contains(r) => Some(l.name)
        case EqualTo(l: AttributeReference, r: AttributeReference)
            if sSet.contains(l) && tSet.contains(r) => Some(r.name)
        case _ => None
      }
      if (perConjunct.forall(_.isDefined)) Some(perConjunct.flatten.distinct)
      else None
    }
    val changeKey = keyCols.filter(_.nonEmpty)
    val tVals = tCols.map(c => c -> col(c)).toMap
    val nullVals = graftRelation.schema.fields
      .map(f => f.name -> lit(null).cast(f.dataType)).toMap

    // NOT MATCHED inserts: a source-side anti join against the LIVE rows
    // (DV-masked read), clause-filtered — never touches target content.
    val inserts = if (notMatched.isEmpty) None else {
      val sOnly = sR.join(
        SnapshotStore.read(spark, location, Some(base)), cond, "left_anti")
      val (appliedI, _, valsI) = branch(notMatched, nullVals, names)
      Some(sOnly.filter(appliedI).select(tCols.map(c => valsI(c).as(c)): _*))
    }

    // Acted rows (position-deleted, optionally re-appended): matched
    // pairs under WHEN MATCHED clauses + target-only rows under WHEN NOT
    // MATCHED BY SOURCE clauses. Computed over ONE position scan.
    val acted: Option[DataFrame] =
      if (matched.isEmpty && notMatchedBySource.isEmpty) None
      else {
        val tPos = SnapshotStore.positionScan(spark, location, base)
        val actedM = if (matched.isEmpty) None else {
          val pairs = tPos.join(sR, cond, "inner")
          // ANSI cardinality: ambiguous multi-source matches fail the
          // statement before anything is written. Bounded: matched pairs
          // only, keyed by the physical row identity.
          val dup = pairs.groupBy(col("__file"), col("__pos"))
            .agg(count(lit(1)).as("__graft_n"))
            .filter(col("__graft_n") > 1)
          if (!dup.isEmpty) throw new IllegalStateException(
            "MERGE: a target row matched multiple source rows — the update/" +
              "delete is ambiguous (ANSI cardinality violation); deduplicate " +
              "the source on the merge key")
          val (appliedM, keepM, valsM) = branch(matched, tVals, names)
          Some(pairs.filter(appliedM).select(
            Seq(col("__file"), col("__pos"), keepM.as(GraftDml.Keep)) ++
              tCols.map(c => valsM(c).as(c)): _*))
        }
        val actedN = if (notMatchedBySource.isEmpty) None else {
          val tOnly = tPos.join(sR, cond, "left_anti")
          val (appliedN, keepN, valsN) = branch(notMatchedBySource, tVals, names)
          Some(tOnly.filter(appliedN).select(
            Seq(col("__file"), col("__pos"), keepN.as(GraftDml.Keep)) ++
              tCols.map(c => valsN(c).as(c)): _*))
        }
        (actedM.toSeq ++ actedN.toSeq).reduceOption(_.unionByName(_))
      }

    (acted, inserts) match {
      case (None, None) => () // clause-less statement: nothing to do
      case (Some(a), ins) =>
        // Matched/NMBS clauses read the whole target (cardinality + the
        // anti join semantics): any concurrent addition conflicts.
        SnapshotStore.updateRows(spark, location, base, a, GraftDml.Keep,
          ins, conflictOnAddsIn = None, changeKey = changeKey)
      case (None, Some(ins)) =>
        // Insert-only merge: blind-append conflict semantics (the Delta
        // WriteSerializable contract — rebases over concurrent appends).
        val empty = SnapshotStore.positionScan(spark, location, base)
          .filter(lit(false)).select(
            Seq(col("__file"), col("__pos"), lit(true).as(GraftDml.Keep)) ++
              tCols.map(col): _*)
        SnapshotStore.updateRows(spark, location, base, empty, GraftDml.Keep,
          Some(ins), conflictOnAddsIn = Some(Set.empty))
    }
    Seq.empty
  }

  private def graftRelation =
    GraftDml.graftRelation(target).getOrElse(throw new IllegalStateException(
      s"not a graft snapshot relation: $target")).table
}
