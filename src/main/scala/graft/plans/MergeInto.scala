package graft.plans

import org.apache.spark.sql.{Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.catalog.{CatalogTable, HiveTableRelation}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.FullOuter
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL `MERGE INTO` over plain-parquet catalog tables (SURVEY §2B SQL13).
  *
  * Spark parses MERGE text into [[MergeIntoTable]] but executes it only
  * against DSv2 tables implementing SupportsRowLevelOperations (Delta,
  * Iceberg) — a session-catalog parquet table fails analysis with
  * UNSUPPORTED_FEATURE.TABLE_OPERATION. This rule (injected via
  * [[graft.GraftExtensions]] as a resolution rule, so it replaces the
  * node BEFORE CheckAnalysis rejects it) rewrites the resolved
  * MergeIntoTable into a copy-on-write command, which is exactly what
  * the lakehouse formats do for MERGE under CoW anyway — minus their
  * file-level pruning, because a bare parquet table has no per-file
  * match manifest to prune with.
  *
  * Execution shape (all distributed, nothing driver-side but the job
  * orchestration):
  *
  *  1. FULL OUTER join target × source on the merge condition, each
  *     side carrying a presence marker — one shuffle pair (or broadcast
  *     when the source is small, which is the common CDC-batch case:
  *     AQE promotes it from measured sizes).
  *  2. Every output column is a CASE over the WHEN clauses in declared
  *     order (first matching clause wins, per SQL:2016); a keep flag
  *     encodes DELETE and the drop of source-only rows no INSERT clause
  *     accepts. MATCHED / NOT MATCHED [BY SOURCE] classes are disjoint
  *     by the marker predicates.
  *  3. The merged rows are written to a scratch dir, read back, and
  *     INSERT OVERWRITE'd into the target — the read-back breaks the
  *     self-overwrite lineage v1 refuses ("Cannot overwrite a path that
  *     is also being read from"). Non-atomic across the two steps, the
  *     declared v1-table deviation from Delta's transactional commit.
  *
  * Cardinality: SQL requires erroring when a target row matches more
  * than one source row (the update would be ambiguous). Checked by a
  * separate aggregation job over the inner join (count per target row
  * id) — one extra pass, skippable for trusted-unique sources via
  * `spark.graft.merge.cardinalityCheck=false`. Delta runs the same
  * check inside its join; a bare parquet CoW has no place to hide it.
  */
object MergeIntoParquetRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    // only the root can be a MERGE command; never hijack a target that
    // supports native row-level ops (leave those to Spark's own rewrite)
    case m: MergeIntoTable if m.resolved && v1Table(m.targetTable).isDefined =>
      GraftMergeIntoCommand(m)
    case _ => plan
  }

  /** The target's CatalogTable when it is a v1 file/Hive relation. */
  def v1Table(plan: LogicalPlan): Option[CatalogTable] = plan.collectFirst {
    case lr: LogicalRelation if lr.catalogTable.isDefined => lr.catalogTable.get
    case h: HiveTableRelation => h.tableMeta
  }
}

case class GraftMergeIntoCommand(merge: MergeIntoTable)
  extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq.empty

  override def run(spark: SparkSession): Seq[Row] = {
    val tgt = merge.targetTable
    val src = merge.sourceTable
    val table = MergeIntoParquetRewrite.v1Table(tgt).getOrElse(
      throw new IllegalStateException("MERGE target is not a v1 catalog table"))

    // presence markers: non-null exactly when that side produced the row
    val tMark = Alias(Literal(true), "__graft_t")()
    val sMark = Alias(Literal(true), "__graft_s")()
    val joined = Join(
      Project(tgt.output :+ tMark, tgt),
      Project(src.output :+ sMark, src),
      FullOuter, Some(merge.mergeCondition), JoinHint.NONE)
    val tRef = tMark.toAttribute.withNullability(true)
    val sRef = sMark.toAttribute.withNullability(true)
    val matched = And(IsNotNull(tRef), IsNotNull(sRef))
    val tgtOnly = And(IsNotNull(tRef), IsNull(sRef))
    val srcOnly = And(IsNull(tRef), IsNotNull(sRef))

    // WHEN clauses in declared order, each guarded by its row class;
    // classes are disjoint so cross-class order is immaterial, within a
    // class the CASE gives first-match-wins
    def guard(cls: Expression, cond: Option[Expression]): Expression =
      cond.map(And(cls, _)).getOrElse(cls)
    val branches: Seq[(Expression, MergeAction)] =
      merge.matchedActions.map(a => (guard(matched, a.condition), a)) ++
      merge.notMatchedActions.map(a => (guard(srcOnly, a.condition), a)) ++
      merge.notMatchedBySourceActions.map(a => (guard(tgtOnly, a.condition), a))

    // survival: DELETE drops, UPDATE/INSERT keep; unclaimed rows keep
    // iff the target produced them (source-only rows need an INSERT)
    val keep = CaseWhen(
      branches.map { case (c, a) => (c, Literal(a.isInstanceOf[DeleteAction] == false)) },
      Some(IsNotNull(tRef)))

    def assigned(a: MergeAction, attr: Attribute): Option[Expression] = {
      def find(as: Seq[Assignment]): Option[Expression] = as.collectFirst {
        case Assignment(k: Attribute, v) if k.semanticEquals(attr) => v
      }
      a match {
        case u: UpdateAction => find(u.assignments)
        // INSERT: unassigned target columns become NULL
        case i: InsertAction =>
          Some(find(i.assignments).getOrElse(Literal(null, attr.dataType)))
        case _ => None // DELETE rows are dropped by `keep`
      }
    }
    val outCols: Seq[NamedExpression] = tgt.output.map { attr =>
      val cases = branches.flatMap { case (c, a) =>
        assigned(a, attr).map { v =>
          (c, if (v.dataType == attr.dataType) v else Cast(v, attr.dataType))
        }
      }
      val e = if (cases.isEmpty) attr else CaseWhen(cases, Some(attr))
      Alias(e, attr.name)()
    }
    val mergedPlan = Project(outCols, Filter(keep, joined))

    if (spark.conf.get("spark.graft.merge.cardinalityCheck", "true").toBoolean) {
      // ambiguous-match guard: >1 source row per target row is an error
      // (SQL:2016 14.12 GR 6). Inner join multiplicity per target row id;
      // the id only has to be stable within this one job.
      val tid = Alias(MonotonicallyIncreasingID(), "__graft_tid")()
      val j2 = Join(Project(tgt.output :+ tid, tgt), src,
        org.apache.spark.sql.catalyst.plans.Inner,
        Some(merge.mergeCondition), JoinHint.NONE)
      val dup = ColumnBridge.ofRows(spark, j2)
        .groupBy(org.apache.spark.sql.functions.col(tid.name))
        .count().where(org.apache.spark.sql.functions.col("count") > 1)
        .limit(1).count()
      if (dup > 0) throw new UnsupportedOperationException(
        "MERGE: a target row matches more than one source row " +
          "(set spark.graft.merge.cardinalityCheck=false to skip this check)")
    }

    // copy-on-write: scratch-materialize, read back (breaks the
    // self-overwrite lineage), INSERT OVERWRITE by position
    val merged = ColumnBridge.ofRows(spark, mergedPlan)
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_merge_").resolve("out").toString
    merged.write.mode(SaveMode.Overwrite).parquet(scratch)
    spark.read.schema(merged.schema).parquet(scratch)
      .write.mode(SaveMode.Overwrite)
      .insertInto(table.identifier.quotedString)
    // scratch cleanup is best-effort; the table no longer references it
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(scratch).getParentFile)
    Seq.empty
  }
}
