package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{GraftConcurrentCommitException, GraftInjectedCrash, TableCommit}

/** Fault-injection and concurrency laws for the TableCommit manifest
  * protocol under the DML copy-on-write paths (VERDICT r15 items 2+3).
  *
  * Atomicity contract: the `status=applied` manifest write is THE
  * commit point. A crash at any protocol point before it must leave
  * the table byte-identical to the pre-statement state; a crash at any
  * point after it must leave the post-commit state fully served by the
  * manifest-aware read and fully recoverable into the plain directory.
  * Mid-apply, a plain-directory reader may see duplicated rows
  * (rename-in happens before delete-old), NEVER missing ones — the
  * failure mode the r15 delete-then-rename order had.
  *
  * Concurrency contract: a writer whose base version moved between its
  * read and its publish throws [[GraftConcurrentCommitException]]
  * without damaging the winner's commit; re-running the loser applies
  * it exactly once on the new base (sql20 puts the same loop under the
  * DuckDB oracle).
  */
class CommitAtomicitySpec extends AnyFunSuite with SparkTestBase {

  private var n = 0

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
    f.delete(): Unit
  }

  /** Fresh 4-file catalog parquet table: k 1..100 range-packed so a
    * `k <= 10` predicate provably touches ONE file (the pruned path).
    */
  private def freshTable(): (String, java.io.File) = {
    n += 1
    val tbl = s"commit_spec_t$n"
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_$tbl"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    rm(new java.io.File(path))
    import spark.implicits._
    (1L to 100L).map(k => (k, k * 10L)).toDF("k", "v")
      .repartitionByRange(4, org.apache.spark.sql.functions.col("k"))
      .write.parquet(path)
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v BIGINT) " +
      s"USING parquet LOCATION '$path'")
    (tbl, new java.io.File(path))
  }

  private def catalogTable(tbl: String) =
    spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tbl))

  private def rows(tbl: String): Seq[(Long, Long)] =
    spark.sql(s"SELECT k, v FROM $tbl").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  private def dataFiles(dir: java.io.File): Set[String] = {
    def walk(f: java.io.File, prefix: String): Seq[String] =
      Option(f.listFiles).toSeq.flatten.flatMap { c =>
        if (c.getName.startsWith(".") || c.getName.startsWith("_")) Nil
        else if (c.isDirectory) walk(c, s"$prefix${c.getName}/")
        else Seq(s"$prefix${c.getName}")
      }
    walk(dir, "").toSet
  }

  private val pre: Seq[(Long, Long)] =
    (1L to 100L).map(k => (k, k * 10L)).sorted
  private def bump(s: Seq[(Long, Long)]): Seq[(Long, Long)] =
    s.map { case (k, v) => if (k <= 10) (k, v + 1) else (k, v) }
  private def updateSql(tbl: String): String =
    s"UPDATE $tbl SET v = v + 1 WHERE k <= 10"

  private def assertInjected(t: Throwable): Unit = {
    val chain = Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain.exists(_.isInstanceOf[GraftInjectedCrash]),
      s"expected the injected crash, got: $t")
  }

  test("crash BEFORE the commit point: pre-commit table survives byte-identical") {
    val (tbl, dir) = freshTable()
    val before = dataFiles(dir)
    for (point <- Seq("beforeReserve", "beforePublish")) {
      TableCommit.crashPoint = Some(point)
      try assertInjected(intercept[Throwable](spark.sql(updateSql(tbl))))
      finally TableCommit.crashPoint = None
      assert(dataFiles(dir) === before,
        s"crash at $point must leave the data-file set untouched")
      assert(rows(tbl) === pre, s"crash at $point must leave every row")
    }
    // the statement reruns cleanly after either rollback
    spark.sql(updateSql(tbl))
    assert(rows(tbl) === bump(pre))
  }

  test("crash AFTER the commit point: readLive is exact, recover converges") {
    for (point <- Seq("afterPublish", "betweenMoveAndDelete")) {
      val (tbl, dir) = freshTable()
      TableCommit.crashPoint = Some(point)
      try assertInjected(intercept[Throwable](spark.sql(updateSql(tbl))))
      finally TableCommit.crashPoint = None
      val table = catalogTable(tbl)
      // the manifest-aware read serves EXACTLY the committed state even
      // while the directory is torn (pending renames resolve to scratch)
      val live = TableCommit.readLive(spark, table)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(live === bump(pre), s"readLive after $point crash")
      // a plain-directory reader may see the touched rows twice
      // (betweenMoveAndDelete) or still old (afterPublish) — but NEVER
      // a missing row: every pre-image key is present
      assert(rows(tbl).map(_._1).toSet === pre.map(_._1).toSet,
        s"no row may vanish mid-apply ($point)")
      // roll forward: the plain directory converges to the manifest
      TableCommit.recover(spark, table)
      assert(rows(tbl) === bump(pre), s"recovered state after $point")
      val m = TableCommit.latestManifest(
        TableCommit.fsOf(spark, table)._1, TableCommit.fsOf(spark, table)._2)
      assert(m.exists(_.applied))
      assert(dataFiles(dir) === m.get.live.toSet,
        "directory must equal the manifest's live set after recovery")
      assert(!dir.listFiles.exists(_.getName.startsWith(".graft_cow_")),
        "recovery must drop the scratch dir")
      // and the NEXT statement both self-heals and commits a new version
      spark.sql(s"UPDATE $tbl SET v = v + 1 WHERE k <= 10")
      assert(rows(tbl) === bump(bump(pre)))
    }
  }

  test("two writers on the pruned path: loser throws, winner survives, retry applies once") {
    val (tbl, _) = freshTable()
    var fired = false
    TableCommit.beforeReserveHook = () => {
      if (!fired) {
        fired = true
        // writer B slips in AFTER A read its base and wrote scratch,
        // BEFORE A claims its version — B commits first and must win
        spark.sql(s"UPDATE $tbl SET v = v * 2 WHERE k <= 50")
      }
    }
    val t = try intercept[Throwable](spark.sql(updateSql(tbl)))
    finally TableCommit.beforeReserveHook = () => ()
    val chain = Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain.exists(_.isInstanceOf[GraftConcurrentCommitException]),
      s"loser must throw the conflict, got: $t")
    // winner applied EXACTLY once, loser not at all
    val afterB = pre.map { case (k, v) => if (k <= 50) (k, v * 2) else (k, v) }
    assert(rows(tbl) === afterB)
    // retry the loser: re-reads the new base, applies exactly once
    spark.sql(updateSql(tbl))
    assert(rows(tbl) === bump(afterB))
  }

  test("two writers on the full-rewrite path: conflict detected BEFORE any mutation") {
    val (tbl, _) = freshTable()
    var fired = false
    TableCommit.beforeReserveHook = () => {
      if (!fired) {
        fired = true
        spark.sql(s"UPDATE $tbl SET v = v * 2 WHERE k <= 50")
      }
    }
    // WHERE-less UPDATE takes the full INSERT OVERWRITE path, whose
    // version reservation happens before the first target byte moves
    val t = try intercept[Throwable](spark.sql(s"UPDATE $tbl SET v = v + 1"))
    finally TableCommit.beforeReserveHook = () => ()
    val chain = Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain.exists(_.isInstanceOf[GraftConcurrentCommitException]))
    val afterB = pre.map { case (k, v) => if (k <= 50) (k, v * 2) else (k, v) }
    assert(rows(tbl) === afterB, "the full path must not touch the table on conflict")
    spark.sql(s"UPDATE $tbl SET v = v + 1")
    assert(rows(tbl) === afterB.map { case (k, v) => (k, v + 1) })
  }

  test("partitioned target: pruned-commit crash recovery preserves partition subdirs") {
    n += 1
    val tbl = s"commit_spec_t$n"
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_$tbl"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    rm(new java.io.File(path))
    import spark.implicits._
    (1L to 100L).map(k => (k, k * 10L, (k % 4).toString))
      .toDF("k", "v", "p")
      .write.partitionBy("p").parquet(path)
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v BIGINT, p STRING) " +
      s"USING parquet PARTITIONED BY (p) LOCATION '$path'")
    spark.sql(s"MSCK REPAIR TABLE $tbl")
    val prePart: Seq[(Long, Long)] =
      (1L to 100L).map(k => (k, k * 10L)).sorted
    def bumpP(s: Seq[(Long, Long)]) =
      s.map { case (k, v) => if (k % 4 == 1 && k <= 10) (k, v + 1) else (k, v) }
    // the WHERE pins one partition AND a k-range, so the commit's adds
    // and dels both live under the p=1 subdirectory
    val upd = s"UPDATE $tbl SET v = v + 1 WHERE p = '1' AND k <= 10"
    TableCommit.crashPoint = Some("betweenMoveAndDelete")
    try assertInjected(intercept[Throwable](spark.sql(upd)))
    finally TableCommit.crashPoint = None
    val table = catalogTable(tbl)
    val live = TableCommit.readLive(spark, table)
      .select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(live === bumpP(prePart), "partition-aware readLive mid-tear")
    TableCommit.recover(spark, table)
    assert(rows(tbl) === bumpP(prePart))
    // manifest live paths carry the partition subdir and match disk
    val (fs, loc) = TableCommit.fsOf(spark, table)
    val m = TableCommit.latestManifest(fs, loc).get
    assert(m.live.forall(_.matches("p=./.*")),
      s"live paths must be partition-relative: ${m.live.take(3)}")
    assert(TableCommit.listDataFiles(fs, loc).toSet === m.live.toSet)
    // recover is idempotent: a second run changes nothing
    TableCommit.recover(spark, table)
    assert(rows(tbl) === bumpP(prePart))
  }

  test("MERGE rides the same protocol: versions advance, recover is a no-op when converged") {
    val (tbl, _) = freshTable()
    import spark.implicits._
    Seq((1L, 999L), (101L, 1010L)).toDF("k", "v").createOrReplaceTempView("src_caspec")
    spark.sql(
      s"""MERGE INTO $tbl t USING src_caspec s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    val table = catalogTable(tbl)
    val (fs, loc) = TableCommit.fsOf(spark, table)
    assert(TableCommit.currentVersion(fs, loc) === 1)
    val expected = (pre.filterNot(_._1 == 1L) ++ Seq((1L, 999L), (101L, 1010L))).sorted
    assert(rows(tbl) === expected)
    TableCommit.recover(spark, table) // converged: must change nothing
    assert(rows(tbl) === expected)
    spark.sql(s"DELETE FROM $tbl WHERE k = 101")
    assert(TableCommit.currentVersion(fs, loc) === 2)
    assert(rows(tbl) === (pre.filterNot(_._1 == 1L) ++ Seq((1L, 999L))).sorted)
  }
}
