package graft.plans

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Path-based snapshot tables on the [[TableCommit]] protocol (VERDICT
  * r16 item 3) — ONE commit arbiter for every graft table.
  *
  * Before r17 the m32–m39 lakehouse entries used private, one-writer
  * conventions: m32/m33/m37/m38 tracked versions as DRIVER-MEMORY
  * file-set diffs (no on-disk manifest at all — two concurrent appends
  * could silently interleave version numbers), and m39 carried its own
  * create-exclusive commit file that duplicated the OCC arbiter
  * TableCommit already owns. Now every snapshot commit is the same
  * begin → scratch-write → reserve → publish cycle the DML paths ride:
  *
  *  - `_graft_commits/v{N}.lock` is the one OCC arbiter — a snapshot
  *    append and a DML writer (or two snapshot appends) racing the
  *    same version resolve identically: exactly one wins, the loser
  *    throws [[GraftConcurrentCommitException]] with the winner's
  *    commit intact, and a retry re-reads the new base.
  *  - `v{N}.txt` is the snapshot: its `live` list IS the version's
  *    file set, so time travel (read v1 while v2 exists), change feeds
  *    (manifest set-diff), rollback (new manifest = old live list) and
  *    expiration (reference counting across manifests) are all
  *    metadata operations over the same files recovery and readLive
  *    already understand.
  *
  * Unlike the DML copy-on-write commits, snapshot commits NEVER delete
  * data files at commit time — history retention is the point; only
  * [[expire]] physically reclaims, and only files no retained manifest
  * references. Scale: a commit costs the new files + one lock create +
  * one manifest rename; reads cost exactly the named files. At 100 TB
  * the manifests stay metadata-sized (file names, not data).
  */
object SnapshotTable {

  def fsOf(spark: SparkSession, dir: String): (FileSystem, HPath) = {
    val loc = new HPath(dir)
    (loc.getFileSystem(ColumnBridge.hadoopConf(spark)), loc)
  }

  /** The live file set of version `v` (manifest-recorded). */
  def liveAt(fs: FileSystem, loc: HPath, v: Int): Seq[String] =
    TableCommit.readManifest(fs, loc, v).map(_.live).getOrElse(
      throw new IllegalStateException(
        s"snapshot table at $loc has no manifest for version $v"))

  /** Commit a new version: optionally write `df`'s rows as new data
    * files (scratch dir inside the table location, renamed in AFTER the
    * manifest publish — the same torn-window discipline as the DML
    * swap), with the new live set computed by `liveOf(previousLive,
    * newFileRelPaths)`. Returns the committed version. Commit shapes:
    *
    *  - initial/overwrite: `liveOf = (_, nw) => nw`
    *  - append:            `liveOf = (prev, nw) => prev ++ nw`
    *  - compaction:        `liveOf = (prev, nw) => (prev -- replaced) ++ nw`
    *    (replaced files stay on DISK — older versions still reference
    *    them; expire reclaims when no retained version does)
    *  - rollback to vN:    `df = None, liveOf = (_, _) => liveAt(vN)`
    *
    * A loser of the version race cleans its scratch and rethrows —
    * nothing of a failed commit ever reaches the table's live state.
    */
  def commit(spark: SparkSession, dir: String, df: Option[DataFrame],
      liveOf: (Seq[String], Seq[String]) => Seq[String]): Int = {
    val (fs, loc) = fsOf(spark, dir)
    fs.mkdirs(loc)
    commitAt(spark, dir, df, liveOf, TableCommit.begin(fs, loc))
  }

  /** [[commit]] against an EXPLICITLY recorded base version — the seam
    * specs use to stage a stale-base writer (the lost-update
    * interleave: record the base, let another writer commit, then
    * watch this one's reserve throw).
    */
  def commitAt(spark: SparkSession, dir: String, df: Option[DataFrame],
      liveOf: (Seq[String], Seq[String]) => Seq[String], base: Int): Int = {
    val (fs, loc) = fsOf(spark, dir)
    fs.mkdirs(loc)
    val prevLive: Seq[String] =
      TableCommit.readManifest(fs, loc, base).map(_.live)
        .getOrElse(TableCommit.listDataFiles(fs, loc))
    val scratchName = s".graft_snap_${java.util.UUID.randomUUID()}"
    val scratch = new HPath(loc, scratchName)
    var published = false
    try {
      val adds: Seq[(String, String)] = df match {
        case None => Nil
        case Some(data) =>
          data.write.parquet(scratch.toString)
          TableCommit.listDataFiles(fs, scratch)
            .map(rel => (s"$scratchName/$rel", rel))
      }
      val v = TableCommit.reserve(fs, loc, base) // the shared OCC arbiter
      TableCommit.publish(fs, loc, TableCommit.Manifest(
        v, if (adds.isEmpty) None else Some(scratchName), adds, Nil,
        liveOf(prevLive, adds.map(_._2)).sorted))
      published = true
      adds.foreach { case (src, dst) =>
        val (s0, d0) = (new HPath(loc, src), new HPath(loc, dst))
        fs.mkdirs(d0.getParent)
        if (!fs.rename(s0, d0)) throw new java.io.IOException(
          s"graft snapshot commit: rename $s0 -> $d0 failed")
      }
      fs.delete(scratch, true)
      v
    } catch {
      case e: Throwable =>
        // losing the reserve race (or any pre-publish failure) must
        // leave the table exactly as the winner committed it
        if (!published) fs.delete(scratch, true)
        throw e
    }
  }

  /** Read version `v`: a scan of exactly its manifest's files. */
  def read(spark: SparkSession, dir: String, v: Int): DataFrame = {
    val (fs, loc) = fsOf(spark, dir)
    spark.read.parquet(
      liveAt(fs, loc, v).map(rel => new HPath(loc, rel).toString): _*)
  }

  /** Read the LATEST committed version (crashed reservations — locks
    * without manifests — don't count).
    */
  def readLatest(spark: SparkSession, dir: String): DataFrame = {
    val (fs, loc) = fsOf(spark, dir)
    val m = TableCommit.latestManifest(fs, loc).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $loc"))
    spark.read.parquet(m.live.map(rel => new HPath(loc, rel).toString): _*)
  }

  /** Expire every version NOT in `retain`: physically delete the data
    * files no retained manifest references (reference counting across
    * TableCommit manifests — a file shared with a retained version
    * survives). Returns the deleted relative paths. Metadata-sized
    * work: set arithmetic over manifests plus one delete per dead file.
    */
  def expire(spark: SparkSession, dir: String, retain: Seq[Int]): Seq[String] = {
    val (fs, loc) = fsOf(spark, dir)
    val referenced = retain.flatMap(v => liveAt(fs, loc, v)).toSet
    val dead = TableCommit.listDataFiles(fs, loc)
      .filterNot(referenced)
    dead.foreach(f => fs.delete(new HPath(loc, f), false))
    dead
  }
}
