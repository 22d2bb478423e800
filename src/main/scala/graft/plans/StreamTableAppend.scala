package graft.plans

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exactly-once streaming append into a [[TableCommit]]-governed
  * catalog table — the lakehouse ingest loop's sink half (t39, r17).
  *
  * `foreachBatch` delivers effectively-once: a crash between the
  * sink's commit and the checkpoint's commit marker re-delivers the
  * batch under the SAME batchId on restart. An idempotent sink must
  * therefore gate on a batch high-water that is TRANSACTIONAL with the
  * data it guards — a high-water kept anywhere else (a side file, the
  * checkpoint itself) reopens the exact torn window it exists to
  * close. Here the high-water rides the commit manifest's `note`
  * lines, published in the same atomic metadata write as the batch's
  * file list: the data and the gate can never disagree.
  *
  * The gate reads the MAX over every published manifest's note (not
  * just the latest manifest's): interleaved non-streaming commits —
  * a CDC MERGE, a compaction ([[Compaction]]) — publish without
  * notes, and a latest-only read under a fresh manifest would forget
  * the high-water and re-apply a replay. The scan is one metadata
  * read per version, the same snapshot-log walk every lakehouse
  * reader performs; a production deployment caps it with ordinary
  * log checkpointing. OCC conflicts with concurrent writers retry
  * bounded-ly with a fresh base — the append's row set is
  * base-independent, so a retry is always safe.
  */
object StreamTableAppend {

  /** Highest batchId any published commit recorded under `key`;
    * -1 when none has.
    */
  def highWater(fs: FileSystem, loc: HPath, key: String): Long =
    (1 to TableCommit.currentVersion(fs, loc))
      .flatMap(v => TableCommit.readManifest(fs, loc, v))
      .flatMap(_.notes.get(key))
      .map(_.toLong)
      .foldLeft(-1L)(math.max)

  /** Commit `df` as an append if `batchId` is above the table's
    * recorded high-water; return false (no-op) when the batch was
    * already committed — the replay gate. Call from `foreachBatch`.
    */
  def appendBatch(spark: SparkSession, tableName: String, df: DataFrame,
      batchId: Long, key: String = "stream_hw",
      maxRetries: Int = 3): Boolean = {
    val table = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseTableIdentifier(tableName))
    var attempt = 0
    while (true) {
      TableCommit.recover(spark, table)
      val (fs, loc) = TableCommit.fsOf(spark, table)
      val base = TableCommit.begin(fs, loc)
      if (highWater(fs, loc, key) >= batchId) return false
      try {
        CopyOnWrite.appendCommit(spark, table, df.queryExecution.analyzed,
          table.partitionColumnNames, base,
          Map(key -> batchId.toString))
        return true
      } catch {
        case _: GraftConcurrentCommitException if attempt < maxRetries =>
          attempt += 1 // fresh base next round; the gate re-checks too
      }
    }
    false // unreachable
  }
}
