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
  * the high-water and re-apply a replay. The fold reads the log
  * CHECKPOINT plus the retained manifest tail
  * ([[TableCommit.checkpointLog]], m41) — O(tail) per batch at any
  * table age, the same log-compaction move Delta/Iceberg make. OCC
  * conflicts with concurrent writers retry bounded-ly with a fresh
  * base — the append's row set is base-independent, so a retry is
  * always safe.
  */
object StreamTableAppend {

  /** Highest batchId any published commit recorded under `key`;
    * -1 when none has. Reads the checkpoint + retained-manifest fold
    * ([[TableCommit.foldNotes]]) — O(retained tail), not O(history),
    * once [[TableCommit.checkpointLog]] runs on its maintenance cadence
    * (m41). The fold is last-writer-wins per key, which equals the max
    * here because this gate only ever admits a batchId ABOVE the
    * current high-water — recorded values ascend by construction.
    */
  def highWater(fs: FileSystem, loc: HPath, key: String): Long =
    TableCommit.foldNotes(fs, loc).get(key).map(_.toLong).getOrElse(-1L)

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
