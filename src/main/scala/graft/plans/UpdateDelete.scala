package graft.plans

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL `UPDATE` / `DELETE` over plain-parquet catalog tables (SURVEY
  * §2B SQL14/SQL15) — the highest-frequency DML a real user hits
  * (GDPR scrubs, backfill fixes) that vanilla Spark rejects on v1
  * tables with UNSUPPORTED_FEATURE.TABLE_OPERATION, exactly like MERGE
  * did before [[MergeIntoParquetRewrite]]. Both are strict subsets of
  * the MERGE machinery: one table scan, a Project (UPDATE: per-column
  * `CASE WHEN cond THEN value ELSE old END`) or a Filter (DELETE: keep
  * rows where the predicate is not TRUE — false OR null keeps, per
  * SQL's three-valued DELETE semantics), then a copy-on-write commit.
  *
  * The commit is FILE-PRUNED (VERDICT r13 item 1): a predicate-pushed
  * pre-pass finds the files that contain ≥1 modifiable row, ONLY those
  * files are rewritten, and every other file stays on disk untouched —
  * a one-row GDPR scrub of a 100 TB table rewrites one file, not
  * 100 TB. See [[CopyOnWrite]] for the commit contract and the cases
  * that fall back to the full-table rewrite.
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

/** Copy-on-write commit machinery shared by UPDATE/DELETE/MERGE.
  *
  * Two commit shapes:
  *
  *  1. [[overwrite]] — the FULL rewrite: materialize every post-DML row
  *     to scratch, read back (breaking the self-overwrite lineage v1
  *     refuses), INSERT OVERWRITE the target. Always correct; O(table)
  *     write cost. Kept for the cases pruning cannot serve (see below).
  *
  *  2. [[prunedCommit]] — the FILE-PRUNED rewrite (VERDICT r13 item 1):
  *     given the set of data files that can contain modified rows
  *     ([[touchedFiles]]) and a rewrite plan re-bound onto exactly
  *     those files ([[prunedRelation]]), write ONLY the rewritten rows
  *     to a scratch dir, then swap at the FILE level — delete the
  *     touched files, move the new ones in, leave every other file
  *     byte-identical on disk (UpdateDeleteSpec pins that law). This is
  *     what Delta/Iceberg CoW does for DML, re-created on bare parquet:
  *     their stats manifest is replaced by one predicate-pushed scan in
  *     which parquet footer min/max already skip the data pages of
  *     files the predicate cannot touch, so the pre-pass costs
  *     metadata + the touched slice, and the rewrite costs
  *     O(files-with-hits), not O(table).
  *
  * Fallbacks to the full rewrite (correctness is never at stake —
  * pruning is purely an I/O optimization): non-deterministic or absent
  * predicates (every row modifiable), a touched set that is the whole
  * table, a target that is not a single HadoopFsRelation, or the
  * `spark.graft.dml.filePruning=false` ops dial. Partition-column
  * assignment stopped being a fallback in r17: rows migrate between
  * directories through the scratch write's own `partitionBy`, and the
  * commit registers the partitions it mints — so a matched-subset
  * row migration costs O(touched files), not O(table).
  *
  * Both shapes write scratch BEFORE touching the target, so a failure
  * mid-rewrite leaves the table intact, and BOTH shapes are the SAME
  * [[TableCommit]] snapshot-manifest swap (since r17 — the full rewrite
  * is just the swap with dels = every current file, which retired the
  * `pending` state and its declared crash window): CRASH-ATOMIC (one
  * metadata write is the commit point; a crash on either side of it
  * leaves exactly the pre- or post-commit state, `CommitAtomicitySpec`
  * injects the faults on both shapes) and version-checked at publish,
  * so two concurrent writers cannot silently interleave — the loser
  * throws [[GraftConcurrentCommitException]] and must re-read (sql20
  * exercises retry-after-conflict under the oracle).
  */
private[plans] object CopyOnWrite {

  private[plans] val FileCol = "__graft_file"

  def pruningEnabled(spark: SparkSession): Boolean =
    spark.conf.get("spark.graft.dml.filePruning", "true").toBoolean

  /** The single v1 file relation backing `plan`, when that is its shape. */
  def fsRelationOf(plan: LogicalPlan): Option[LogicalRelation] =
    plan.collect { case lr: LogicalRelation => lr } match {
      case Seq(lr) if lr.relation.isInstanceOf[HadoopFsRelation] => Some(lr)
      case _ => None
    }

  /** `relation` with a `__graft_file` column carrying the source file of
    * each row. The column is projected DIRECTLY over the scan — below
    * any join/filter a condition's subqueries may plan above it — so it
    * is a real column by the time any exchange could otherwise reset
    * `input_file_name()` to the empty string.
    */
  def withFileColumn(spark: SparkSession, relation: LogicalPlan): DataFrame =
    ColumnBridge.ofRows(spark,
      Project(relation.output :+ Alias(InputFileName(), FileCol)(), relation))

  /** Distinct data files containing ≥1 row of `hits` (a frame that still
    * carries [[FileCol]]). The collected list plays the same driver-side
    * role as Spark's own file index — bounded by file count, never rows.
    */
  def touchedFiles(hits: DataFrame): Seq[String] =
    hits.select(FileCol).distinct().collect().map(_.getString(0)).toSeq

  /** `relationPlan` re-bound onto exactly `files`, PRESERVING the
    * original output attributes so every already-resolved expression
    * above (conditions with subqueries, assignments, merge clauses)
    * still binds. Implementation: build a fresh file-source relation
    * over the pruned list (basePath recovers partition values for a
    * partitioned layout) and swap it under the original
    * [[LogicalRelation]] node via `copy`, which keeps `output`. Returns
    * None when the new relation's schema does not line up positionally
    * — the caller then falls back to the full rewrite.
    */
  def prunedRelation(spark: SparkSession, relationPlan: LogicalPlan,
      lr: LogicalRelation, table: CatalogTable,
      files: Seq[String]): Option[LogicalPlan] = {
    if (files.isEmpty) {
      // no file can hold a modifiable row: an empty relation with the
      // SAME attributes (MERGE's all-source-rows-are-inserts case)
      return Some(relationPlan.transformUp {
        case l: LogicalRelation if l eq lr => LocalRelation(lr.output)
      })
    }
    val fsRel = lr.relation.asInstanceOf[HadoopFsRelation]
    val reader = spark.read.schema(lr.schema)
    val prunedDf = (if (fsRel.partitionSchema.nonEmpty)
      reader.option("basePath", table.location.toString) else reader)
      .parquet(files: _*)
    val newLr = prunedDf.queryExecution.analyzed
      .collectFirst { case l: LogicalRelation => l }
    newLr match {
      case Some(n) if n.schema.map(f => (f.name, f.dataType)) ==
          lr.schema.map(f => (f.name, f.dataType)) =>
        Some(relationPlan.transformUp {
          case l: LogicalRelation if l eq lr => lr.copy(relation = n.relation)
        })
      case _ => None
    }
  }

  /** Full-table copy-on-write: materialize the complete post-DML row
    * set and commit it as a manifest swap whose dels list is EVERY
    * current data file (VERDICT r16 item 2) — the pruned path's exact
    * protocol with a bigger file list. This retired both the `pending`
    * manifest state and the full path's two real hazards: the old
    * INSERT OVERWRITE recursively deleted the table location (taking
    * `_graft_commits/` — all version history and locks — with it,
    * ADVICE r16), and a crash inside it left a torn directory only
    * Spark's committer understood. Now a crash at ANY point leaves
    * exactly the pre- or post-commit state (`CommitAtomicitySpec`
    * injects the faults on this path too), partition-column values ride
    * the scratch write's `partitionBy` (rows migrate directories
    * naturally), and partitions the rewrite mints — including the
    * null-value sentinel — are registered from the commit's own adds.
    * Partitions the rewrite EMPTIES keep their (now fileless) catalog
    * entries: a zero-file partition serves zero rows, which is the
    * committed truth.
    */
  def overwrite(spark: SparkSession, table: CatalogTable,
      rewritten: LogicalPlan, base: Int): Unit = {
    val (fs, loc) = TableCommit.fsOf(spark, table)
    swapCommit(spark, table, rewritten,
      delsRel = TableCommit.listDataFiles(fs, loc),
      table.partitionColumnNames, base)
  }

  /** File-pruned commit: write `rewritten` (already bound to only the
    * touched files plus any inserted rows) under a dot-prefixed scratch
    * dir INSIDE the table location — invisible to listings, and on the
    * table's own filesystem so the swap is pure rename, no byte copy —
    * then swap at the file level, preserving partition subdirectories.
    * Untouched files are never opened, let alone rewritten.
    *
    * The swap is CRASH-ATOMIC under the [[TableCommit]] manifest
    * protocol (r16 — this closes the r15 declared deviation at the old
    * delete-then-rename window): the commit point is ONE atomic
    * metadata write (the `status=applied` manifest naming the
    * post-commit file set); everything before it rolls back to the
    * byte-identical pre-commit table, everything after it rolls forward
    * idempotently ([[TableCommit.recover]]), and the apply order is
    * rename-in-then-delete so even a mid-apply plain-directory reader
    * can only ever see duplicated rows, never missing ones
    * ([[TableCommit.readLive]] sees exactly the committed state
    * throughout). Errors during the scratch write (including MERGE's
    * in-flight cardinality AssertTrue) still leave the target
    * untouched — the manifest is only published after scratch fully
    * succeeds.
    */
  def prunedCommit(spark: SparkSession, table: CatalogTable,
      rewritten: LogicalPlan, touched: Seq[String],
      partitionCols: Seq[String], base: Int): Unit = {
    val (_, loc) = TableCommit.fsOf(spark, table)
    // relativize the touched-file URIs against the table location, and
    // FAIL FAST if one is not under it (ADVICE r16: a silent
    // stripPrefix no-op here would understate the dels list, so the
    // manifest's live set would keep files the commit meant to replace)
    val locPath = loc.toUri.getPath.stripSuffix("/")
    val dels = touched.map { f =>
      val p = new HPath(new java.net.URI(f)).toUri.getPath
      require(p.startsWith(locPath + "/"),
        s"graft CoW commit: touched file $p is not under the table " +
          s"location $locPath — refusing to publish a manifest whose " +
          "delete list would silently miss it")
      p.stripPrefix(locPath).stripPrefix("/")
    }
    swapCommit(spark, table, rewritten, dels, partitionCols, base)
  }

  /** The manifest-swap commit shared by the pruned and full-rewrite
    * shapes: write `rewritten` under a dot-prefixed scratch dir inside
    * the table location, publish a `status=applied` manifest naming the
    * post-commit file set, then apply (rename in, delete `delsRel`,
    * register minted partitions). See [[prunedCommit]] for the
    * atomicity contract — it holds identically for both callers.
    */
  /** Pure append through the same swap: no dels, so live grows to
    * current ∪ new — the streaming micro-batch commit (t39) and any
    * INSERT-shaped writer. `notes` ride the manifest publish, making
    * app metadata (the stream's batch high-water) transactional with
    * the data.
    */
  def appendCommit(spark: SparkSession, table: CatalogTable,
      newRows: LogicalPlan, partitionCols: Seq[String], base: Int,
      notes: Map[String, String]): Unit =
    swapCommit(spark, table, newRows, Nil, partitionCols, base, notes)

  private def swapCommit(spark: SparkSession, table: CatalogTable,
      rewritten: LogicalPlan, delsRel: Seq[String],
      partitionCols: Seq[String], base: Int,
      notes: Map[String, String] = Map.empty): Unit = {
    val df = ColumnBridge.ofRows(spark, rewritten)
    val (fs, loc) = TableCommit.fsOf(spark, table)
    val scratchName = s".graft_cow_${java.util.UUID.randomUUID()}"
    val scratch = new HPath(loc, scratchName)
    var published = false
    try {
      val w = df.write.mode(SaveMode.Overwrite)
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(scratch.toString)
      // manifest content: scratch files move to the mirrored table
      // paths (UUID part names cannot collide), replaced files go away,
      // live = (current − dels) ∪ new
      val adds = TableCommit.listDataFiles(fs, scratch)
        .map(rel => (s"$scratchName/$rel", rel))
      val dels = delsRel
      val live = (TableCommit.listDataFiles(fs, loc).toSet --
        dels) ++ adds.map(_._2)
      val v = TableCommit.reserve(fs, loc, base) // OCC check-and-claim
      TableCommit.publish(fs, loc, TableCommit.Manifest(
        v, Some(scratchName), adds, dels, live.toSeq.sorted, notes))
      published = true // THE commit point: pre-commit state ends here
      TableCommit.maybeCrashApply("afterPublish")
      // apply: renames FIRST, deletes SECOND — a torn window duplicates
      // rows for a plain-directory reader, never loses them
      adds.foreach { case (src, dst) =>
        val (s0, d0) = (new HPath(loc, src), new HPath(loc, dst))
        fs.mkdirs(d0.getParent)
        if (!fs.rename(s0, d0)) throw new java.io.IOException(
          s"graft CoW commit: rename $s0 -> $d0 failed")
      }
      TableCommit.maybeCrashApply("betweenMoveAndDelete")
      dels.foreach(d => fs.delete(new HPath(loc, d), false))
      fs.delete(scratch, true)
      // partitions this commit MINTED (MERGE inserts into a partitioned
      // target) must reach the catalog or a table reader never lists
      // them — registration is derived from the commit's own add paths,
      // so it costs one idempotent catalog call per NEW partition, and
      // recover() replays it from the manifest after a crash
      TableCommit.registerMintedPartitions(
        spark, table, adds.map(_._2), partitionCols)
    } catch {
      case e: Throwable =>
        // before the commit point nothing visible changed: roll the
        // scratch back so the table is byte-identical to pre-statement.
        // After it, leave scratch + manifest for recover() to roll
        // forward — deleting scratch here would destroy committed rows.
        if (!published) fs.delete(scratch, true)
        throw e
    } finally {
      // drop the relation/file-listing caches AND the catalog's stale
      // size stats (insertInto's own commit path does the same)
      spark.catalog.refreshTable(table.identifier.quotedString)
      ColumnBridge.updateTableStats(spark, table)
    }
  }
}

/** Nested-field assignment support shared by UPDATE and MERGE (VERDICT
  * r14 item 5): `SET struct.field = x` rebuilds the struct column with a
  * [[UpdateFields]] projection — `withField` semantics — so sibling
  * fields ride through untouched and the whole thing stays one
  * codegen'd Project. Multi-level paths recurse (`a.b.c`); a NULL
  * struct stays NULL (UpdateFields is null-propagating), matching the
  * "no row to update inside" reading.
  *
  * MAP-KEY assignment (r17 — VERDICT r16 item 7): `SET m.k = x` on a
  * MAP column resolves to [[GetMapValue]], and the rewrite is
  * `map_concat(map_filter(m, key != 'k'), map('k', x))` — remove the
  * key (a no-op when absent), then append the new entry, so the
  * semantics are upsert: update when present, insert when absent, the
  * Hive/Iceberg convention for map mutation. A NULL map stays NULL
  * (both HOFs are null-propagating), matching the struct reading; every
  * other entry rides through untouched. The filter guarantees the
  * concat never sees a duplicate key, so the rewrite is independent of
  * `spark.sql.mapKeyDedupPolicy`. All of it is one codegen-friendly
  * Project over the scan — no shuffle, no UDF. Array element
  * assignment is still rejected loudly by the callers ([[keyPath]]
  * returns None).
  */
private[plans] object NestedFields {

  /** One step of an assignment-key path: a struct field by name, or a
    * map entry by (deterministic) key expression.
    */
  sealed trait Seg
  case class FieldSeg(name: String) extends Seg
  case class KeySeg(key: Expression) extends Seg

  /** Decompose a resolved assignment key into (root attribute, path);
    * None for keys that are not a column / struct-field / map-key
    * chain (e.g. array subscripts).
    */
  def keyPath(e: Expression): Option[(Attribute, Seq[Seg])] = e match {
    case a: Attribute => Some((a, Nil))
    case g: GetStructField =>
      keyPath(g.child).map { case (a, p) => (a, p :+ FieldSeg(g.extractFieldName)) }
    case g: GetMapValue if g.key.deterministic =>
      keyPath(g.child).map { case (a, p) => (a, p :+ KeySeg(g.key)) }
    case _ => None
  }

  /** The declared type at `path` inside `dt` (field names matched
    * exactly — the path came from resolution, so it carries the actual
    * field names).
    */
  def typeAt(dt: org.apache.spark.sql.types.DataType,
      path: Seq[Seg]): org.apache.spark.sql.types.DataType =
    path.foldLeft(dt) {
      case (st: org.apache.spark.sql.types.StructType, FieldSeg(name)) =>
        st.fields.find(_.name == name).map(_.dataType).getOrElse(
          throw new IllegalStateException(s"no field $name in ${st.sql}"))
      case (mt: org.apache.spark.sql.types.MapType, KeySeg(_)) =>
        mt.valueType
      case (other, seg) => throw new IllegalStateException(
        s"cannot descend into ${other.sql} at $seg")
    }

  /** `base` (a map) with `key` set to `value`: remove-then-append, so
    * present keys update and absent keys insert. Lambdas are built
    * pre-resolved ([[NamedLambdaVariable]]), so the expression needs no
    * analyzer lambda pass and stays valid in the command's
    * post-resolution Project.
    */
  private def setMapKey(base: Expression, key: Expression,
      value: Expression): Expression = {
    val mt = base.dataType.asInstanceOf[org.apache.spark.sql.types.MapType]
    val k = if (key.dataType == mt.keyType) key else Cast(key, mt.keyType)
    val v = if (value.dataType == mt.valueType) value
      else Cast(value, mt.valueType)
    val kVar = NamedLambdaVariable("k", mt.keyType, nullable = false)
    val vVar = NamedLambdaVariable("v", mt.valueType, mt.valueContainsNull)
    val keep = LambdaFunction(Not(EqualTo(kVar, k)), Seq(kVar, vVar))
    MapConcat(Seq(MapFilter(base, keep), CreateMap(Seq(k, v))))
  }

  /** `base` with the entry at `path` replaced by `value` (cast to the
    * declared type when needed), every other field/entry untouched.
    */
  def setNested(base: Expression, path: Seq[Seg],
      value: Expression): Expression = path match {
    case Seq(KeySeg(k)) => setMapKey(base, k, value)
    case Seq(FieldSeg(last)) =>
      val ft = typeAt(base.dataType, Seq(FieldSeg(last)))
      val cast = if (value.dataType == ft) value else Cast(value, ft)
      UpdateFields(base, Seq(WithField(last, cast)))
    case KeySeg(k) +: rest =>
      val child = GetMapValue(base, k)
      setMapKey(base, k, setNested(child, rest, value))
    case FieldSeg(head) +: rest =>
      val child = ExtractValue(base, Literal(head), (a: String, b: String) => a == b)
      UpdateFields(base, Seq(WithField(head, setNested(child, rest, value))))
    case _ => value
  }

  /** The post-assignment value for `attr` given this action's
    * assignments: Some(top-level value) for a whole-column assignment,
    * Some(struct rebuild) when only nested paths target it, None when
    * the action leaves it alone. Mixing a whole-column and a nested
    * assignment to the same column in one action is ambiguous — loud
    * reject.
    */
  def valueFor(assignments: Seq[Assignment], attr: Attribute,
      what: String): Option[Expression] = {
    val mine = assignments.flatMap(x => keyPath(x.key) match {
      case Some((root, path)) if root.semanticEquals(attr) => Some((path, x.value))
      case _ => None
    })
    if (mine.isEmpty) None
    else if (mine.forall(_._1.isEmpty)) Some(mine.head._2)
    else if (mine.exists(_._1.isEmpty)) throw new UnsupportedOperationException(
      s"$what: column ${attr.name} is assigned both as a whole and by " +
        "nested field in the same action")
    else Some(mine.foldLeft(attr: Expression)((acc, pv) =>
      setNested(acc, pv._1, pv._2)))
  }
}

case class GraftUpdateCommand(update: UpdateTable) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq.empty

  override def run(spark: SparkSession): Seq[Row] = {
    val table = MergeIntoParquetRewrite.v1Table(update.table).getOrElse(
      throw new IllegalStateException("UPDATE target is not a v1 catalog table"))
    // heal a crashed predecessor commit, then record the version this
    // statement's rewrite is based on (the OCC base)
    TableCommit.recover(spark, table)
    val base = {
      val (fs0, loc0) = TableCommit.fsOf(spark, table)
      TableCommit.begin(fs0, loc0)
    }
    // keys must be a column, struct-field, or map-key chain; an array
    // element assignment would be silently missed below — reject loudly
    // (the MERGE ADVICE-r12 rule, relaxed in r14 for struct paths and
    // in r17 for map keys)
    update.assignments.foreach(a =>
      if (NestedFields.keyPath(a.key).isEmpty)
        throw new UnsupportedOperationException(
          s"UPDATE: assignment key (${a.key.sql}) is not a column, " +
            "struct-field, or map-key path — not supported for parquet targets"))
    val cond = update.condition.getOrElse(Literal(true))
    def outCols(rel: LogicalPlan): Seq[NamedExpression] =
      rel.output.map { attr =>
        NestedFields.valueFor(update.assignments, attr, "UPDATE") match {
          case Some(v) =>
            val cast = if (v.dataType == attr.dataType) v else Cast(v, attr.dataType)
            // rows failing (or null on) the WHERE keep their old value
            Alias(CaseWhen(Seq((cond, cast)), Some(attr)), attr.name)()
          case None => attr
        }
      }

    // file pruning applies when the WHERE can exclude files at all.
    // Partition-column reassignment PRUNES TOO (r17): the commit's
    // scratch write partitions by the table's columns, so modified rows
    // migrate to their new directories and the minted partitions are
    // registered from the commit's adds — only the files holding
    // matching rows rewrite (sql23 puts exactly that under the oracle)
    val prunable = CopyOnWrite.pruningEnabled(spark) &&
      update.condition.exists(c => c.deterministic && c != Literal(true))
    val lrOpt = CopyOnWrite.fsRelationOf(update.table)

    (if (prunable) lrOpt else None) match {
      case Some(lr) =>
        val touched = CopyOnWrite.touchedFiles(
          CopyOnWrite.withFileColumn(spark, update.table)
            .filter(ColumnBridge.column(cond)))
        val all = lr.relation.asInstanceOf[HadoopFsRelation]
          .location.inputFiles.length
        if (touched.isEmpty) return Seq.empty // nothing to modify: no-op
        CopyOnWrite.prunedRelation(spark, update.table, lr, table, touched) match {
          case Some(pruned) if touched.size < all =>
            CopyOnWrite.prunedCommit(spark, table,
              Project(outCols(pruned), pruned), touched,
              table.partitionColumnNames, base)
          case _ =>
            CopyOnWrite.overwrite(spark, table,
              Project(outCols(update.table), update.table), base)
        }
      case None =>
        CopyOnWrite.overwrite(spark, table,
          Project(outCols(update.table), update.table), base)
    }
    Seq.empty
  }
}

case class GraftDeleteCommand(delete: DeleteFromTable) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq.empty

  override def run(spark: SparkSession): Seq[Row] = {
    val table = MergeIntoParquetRewrite.v1Table(delete.table).getOrElse(
      throw new IllegalStateException("DELETE target is not a v1 catalog table"))
    TableCommit.recover(spark, table)
    val base = {
      val (fs0, loc0) = TableCommit.fsOf(spark, table)
      TableCommit.begin(fs0, loc0)
    }
    // DELETE removes rows where the predicate is TRUE; FALSE and NULL
    // both keep (SQL three-valued semantics), hence the coalesce; the
    // expression binds to the original attributes, which the pruned
    // relation swap preserves
    val keep: Expression =
      Not(Coalesce(Seq(delete.condition, Literal(false))))

    val prunable = CopyOnWrite.pruningEnabled(spark) &&
      delete.condition.deterministic && delete.condition != Literal(true)
    val lrOpt = CopyOnWrite.fsRelationOf(delete.table)

    (if (prunable) lrOpt else None) match {
      case Some(lr) =>
        // touched = files holding ≥1 row where the predicate is TRUE
        val touched = CopyOnWrite.touchedFiles(
          CopyOnWrite.withFileColumn(spark, delete.table)
            .filter(ColumnBridge.column(delete.condition)))
        val all = lr.relation.asInstanceOf[HadoopFsRelation]
          .location.inputFiles.length
        if (touched.isEmpty) return Seq.empty // no row deletes: no-op
        CopyOnWrite.prunedRelation(spark, delete.table, lr, table, touched) match {
          case Some(pruned) if touched.size < all =>
            CopyOnWrite.prunedCommit(spark, table,
              Filter(keep, pruned), touched,
              table.partitionColumnNames, base)
          case _ =>
            CopyOnWrite.overwrite(spark, table,
              Filter(keep, delete.table), base)
        }
      case None =>
        CopyOnWrite.overwrite(spark, table,
          Filter(keep, delete.table), base)
    }
    Seq.empty
  }
}
