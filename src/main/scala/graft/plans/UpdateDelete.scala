package graft.plans

import org.apache.spark.sql.{Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL `UPDATE` / `DELETE` over plain-parquet catalog tables (SURVEY
  * §2B SQL14/SQL15) — the highest-frequency DML a real user hits
  * (GDPR scrubs, backfill fixes) that vanilla Spark rejects on v1
  * tables with UNSUPPORTED_FEATURE.TABLE_OPERATION, exactly like MERGE
  * did before [[MergeIntoParquetRewrite]]. Both are strict subsets of
  * the MERGE machinery: one table scan, a Project (UPDATE: per-column
  * `CASE WHEN cond THEN value ELSE old END`) or a Filter (DELETE: keep
  * rows where the predicate is not TRUE — false OR null keeps, per
  * SQL's three-valued DELETE semantics), then the same scratch-and-
  * overwrite copy-on-write commit. No join, no window, no shuffle at
  * all — the rewrite is embarrassingly parallel at any scale; what a
  * lakehouse format adds on top is only file-level pruning (rewriting
  * just the files containing hits), which a bare parquet table has no
  * manifest to drive.
  *
  * Injected as a resolution rule via [[graft.GraftExtensions]], same
  * contract as MERGE: swap the resolved node for the command BEFORE
  * CheckAnalysis rejects it; never hijack a target that supports native
  * row-level operations.
  */
object DmlParquetRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u: UpdateTable
        if u.resolved && MergeIntoParquetRewrite.v1Table(u.table).isDefined =>
      GraftUpdateCommand(u)
    case d: DeleteFromTable
        if d.resolved && MergeIntoParquetRewrite.v1Table(d.table).isDefined =>
      GraftDeleteCommand(d)
    case _ => plan
  }
}

/** Shared copy-on-write commit for the DML commands: materialize the
  * rewritten rows to a scratch dir, read them back (breaking the
  * self-overwrite lineage v1 refuses), INSERT OVERWRITE the target by
  * position. A failure during the scratch write leaves the target
  * untouched; the two-step commit itself is the declared v1-table
  * deviation from a lakehouse format's transactional swap.
  */
private[plans] object CopyOnWrite {
  def overwrite(spark: SparkSession, table: CatalogTable,
      rewritten: LogicalPlan): Unit = {
    val df = ColumnBridge.ofRows(spark, rewritten)
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_cow_").resolve("out").toString
    df.write.mode(SaveMode.Overwrite).parquet(scratch)
    // the commit REPLACES the whole table, so the insert must run in
    // STATIC partition-overwrite mode regardless of the session conf:
    // under a user's partitionOverwriteMode=dynamic, a DELETE that
    // empties a partition would leave that partition's old files in
    // place (dynamic only replaces partitions present in the new data)
    val modeKey = "spark.sql.sources.partitionOverwriteMode"
    val prevMode = spark.conf.getOption(modeKey)
    spark.conf.set(modeKey, "static")
    try spark.read.schema(df.schema).parquet(scratch)
      .write.mode(SaveMode.Overwrite)
      .insertInto(table.identifier.quotedString)
    finally prevMode match {
      case Some(v) => spark.conf.set(modeKey, v)
      case None => spark.conf.unset(modeKey)
    }
    // scratch cleanup is best-effort; the table no longer references it
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(scratch).getParentFile)
  }
}

case class GraftUpdateCommand(update: UpdateTable) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq.empty

  override def run(spark: SparkSession): Seq[Row] = {
    val table = MergeIntoParquetRewrite.v1Table(update.table).getOrElse(
      throw new IllegalStateException("UPDATE target is not a v1 catalog table"))
    // nested-field assignment keys would be silently missed by the
    // Attribute lookup below — reject loudly (the MERGE ADVICE-r12 rule)
    update.assignments.foreach(a => a.key match {
      case _: Attribute => ()
      case other => throw new UnsupportedOperationException(
        s"UPDATE: nested-field assignment (${other.sql}) is not supported " +
          "for parquet targets")
    })
    val cond = update.condition.getOrElse(Literal(true))
    val outCols: Seq[NamedExpression] = update.table.output.map { attr =>
      update.assignments.collectFirst {
        case Assignment(k: Attribute, v) if k.semanticEquals(attr) => v
      } match {
        case Some(v) =>
          val cast = if (v.dataType == attr.dataType) v else Cast(v, attr.dataType)
          // rows failing (or null on) the WHERE keep their old value
          Alias(CaseWhen(Seq((cond, cast)), Some(attr)), attr.name)()
        case None => attr
      }
    }
    CopyOnWrite.overwrite(spark, table, Project(outCols, update.table))
    Seq.empty
  }
}

case class GraftDeleteCommand(delete: DeleteFromTable) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq.empty

  override def run(spark: SparkSession): Seq[Row] = {
    val table = MergeIntoParquetRewrite.v1Table(delete.table).getOrElse(
      throw new IllegalStateException("DELETE target is not a v1 catalog table"))
    // DELETE removes rows where the predicate is TRUE; FALSE and NULL
    // both keep (SQL three-valued semantics), hence the coalesce
    val keep = Not(Coalesce(Seq(delete.condition, Literal(false))))
    CopyOnWrite.overwrite(spark, table, Filter(keep, delete.table))
    Seq.empty
  }
}
