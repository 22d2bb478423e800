package graft.plans

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Crash-atomic small-file compaction for parquet catalog tables — the
  * `OPTIMIZE` maintenance command every lakehouse runs, re-created on
  * the [[TableCommit]] manifest-swap protocol (r17).
  *
  * The small-files problem is THE steady-state cost of incremental
  * ingest at 100 TB: a CDC merge or streaming sink lands a few files
  * per partition per batch, and within days a day-partition holds
  * thousands of KB-sized files whose per-file open/footer/schedule
  * overhead dwarfs the data. Compaction must therefore be:
  *
  *  - PARTITION-SCOPED: only directories whose file count exceeds the
  *    threshold rewrite; a quiet partition is never touched (the same
  *    O(touched)-not-O(table) law as the pruned DML commit — at 100 TB
  *    you compact yesterday, not the decade). Healthy partitions stay
  *    byte-identical on disk.
  *  - CONTENT-PRESERVING: the committed row set is exactly the input
  *    row set (the post-compaction read hash-equals the oracle's
  *    recompute; m40 pins it).
  *  - CRASH-ATOMIC and OCC'D: the rewrite rides the same scratch-write
  *    → reserve → publish(applied) → apply cycle as UPDATE/DELETE/
  *    MERGE, so a crash at any point leaves the pre- or post-compaction
  *    state (never torn, never duplicated rows for the manifest-aware
  *    reader), and a compactor racing a writer resolves through the
  *    shared version lock — exactly one wins, the loser retries
  *    ([[GraftConcurrentCommitException]]).
  *
  * Output sizing: each over-fragmented directory's rows are re-packed
  * into max(1, ceil(dirBytes / targetFileBytes)) files via a
  * partition-column repartition (one shuffle over ONLY the fragmented
  * slice; the write's partitionBy routes rows back to their own
  * directories). The repartition width is the total repack-file count,
  * so a 10 TB backlog compaction still parallelizes across the
  * cluster while a single hot day coalesces to its target count.
  */
object Compaction {

  /** Compact every partition directory (or the table root, for an
    * unpartitioned table) holding more than `maxFilesPerDir` data
    * files. Returns (directories compacted, files removed, files
    * written); (0, 0, 0) when the table is already healthy — a no-op
    * that publishes NO new version.
    */
  def compact(spark: SparkSession, tableName: String,
      maxFilesPerDir: Int = 4,
      targetFileBytes: Long = 128L * 1024 * 1024,
      clusterBy: Seq[org.apache.spark.sql.Column] = Nil): (Int, Int, Int) = {
    val table = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseTableIdentifier(tableName))
    TableCommit.recover(spark, table)
    val (fs, loc) = TableCommit.fsOf(spark, table)
    val base = TableCommit.begin(fs, loc)

    // group data files by their directory (partition identity)
    val byDir: Map[String, Seq[String]] = TableCommit.listDataFiles(fs, loc)
      .groupBy(rel => rel.lastIndexOf('/') match {
        case -1 => ""
        case i  => rel.substring(0, i)
      })
    val over = byDir.filter(_._2.size > maxFilesPerDir)
    if (over.isEmpty) return (0, 0, 0)

    val fragged: Seq[String] = over.values.flatten.toSeq
    val bytes = fragged.map(rel => fs.getFileStatus(new HPath(loc, rel)).getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)

    // read ONLY the fragmented slice; basePath recovers partition values
    val reader = spark.read.schema(table.schema)
    val df0 = (if (table.partitionColumnNames.nonEmpty)
      reader.option("basePath", loc.toString) else reader)
      .parquet(fragged.map(rel => new HPath(loc, rel).toString): _*)
    // re-pack: partition-column repartition routes each directory's
    // rows together (one output file per partition per shuffle task);
    // unpartitioned tables repack to the byte-target width directly.
    // CLUSTERED compaction (ZORDER BY / CLUSTER BY): an unpartitioned
    // table range-partitions on the cluster key so output FILES carry
    // pairwise-disjoint min-max ranges (file-level skipping); a
    // partitioned table keeps its directory routing and sorts
    // (partCols ++ cluster) within tasks — the prefix satisfies the
    // writer's partition sort requirement (so no second sort) and the
    // suffix tightens every ROW GROUP's min-max on the cluster key.
    // Pass `ZOrderLong.zorder(a, b)` as the key for two-dimension
    // locality. CompactionSpec owns the layout laws.
    val partCols = table.partitionColumnNames.map(col)
    val df = (table.partitionColumnNames.nonEmpty, clusterBy.nonEmpty) match {
      case (true, true) =>
        df0.repartition(nOut, partCols: _*)
          .sortWithinPartitions(partCols ++ clusterBy: _*)
      case (true, false) => df0.repartition(nOut, partCols: _*)
      case (false, true) =>
        df0.repartitionByRange(nOut, clusterBy: _*)
          .sortWithinPartitions(clusterBy: _*)
      case (false, false) => df0.repartition(nOut)
    }

    CopyOnWrite.prunedCommit(spark, table, df.queryExecution.analyzed,
      fragged.map(rel => new HPath(loc, rel).toString),
      table.partitionColumnNames, base)

    val after = TableCommit.listDataFiles(fs, loc).toSet
    val written = after.size - (byDir.values.map(_.size).sum - fragged.size)
    (over.size, fragged.size, written)
  }
}
