package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL MERGE INTO over plain-parquet catalog tables
  * (graft.plans.MergeIntoParquetRewrite + GraftMergeIntoCommand).
  * The oracle-facing entry is sql13; this spec pins the semantics the
  * oracle can't isolate: clause precedence, partial-column INSERT,
  * NOT MATCHED BY SOURCE actions, and the cardinality guard.
  */
class MergeIntoSpec extends AnyFunSuite with SparkTestBase {

  private var n = 0
  /** Fresh parquet catalog table with (k BIGINT, v BIGINT, tag STRING). */
  private def freshTarget(rows: Seq[(Long, Long, String)]): String = {
    n += 1
    val tbl = s"merge_spec_t$n"
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_$tbl"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(path))
    import spark.implicits._
    rows.toDF("k", "v", "tag").createOrReplaceTempView("merge_seed")
    spark.sql(
      s"CREATE TABLE $tbl USING parquet LOCATION '$path' AS SELECT * FROM merge_seed")
    tbl
  }

  private def result(tbl: String): Set[(Long, Long, String)] =
    spark.sql(s"SELECT k, v, tag FROM $tbl").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSet

  test("update / delete / insert / not-matched-by-source in one statement") {
    val tbl = freshTarget(Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"), (4L, 40L, "d")))
    import spark.implicits._
    // src: k=1 (update), k=2 (conditional delete), k=9 (insert); k=3/4 absent
    Seq((1L, 100L), (2L, -1L), (9L, 900L)).toDF("k", "nv")
      .createOrReplaceTempView("merge_src")
    spark.sql(
      s"""MERGE INTO $tbl t USING merge_src s ON t.k = s.k
         |WHEN MATCHED AND s.nv < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.nv
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)
         |WHEN NOT MATCHED BY SOURCE AND t.v >= 40 THEN DELETE""".stripMargin)
    assert(result(tbl) === Set(
      (1L, 100L, "a"),   // updated, tag untouched
      (3L, 30L, "c"),    // unmatched-by-source, below delete threshold
      (9L, 900L, null))) // inserted; tag not in column list -> NULL
  }

  test("clause order is precedence: first matching WHEN wins") {
    val tbl = freshTarget(Seq((1L, 10L, "a")))
    import spark.implicits._
    Seq((1L, 5L)).toDF("k", "nv").createOrReplaceTempView("merge_src")
    spark.sql(
      s"""MERGE INTO $tbl t USING merge_src s ON t.k = s.k
         |WHEN MATCHED AND s.nv < 10 THEN UPDATE SET v = 111
         |WHEN MATCHED THEN UPDATE SET v = 222""".stripMargin)
    assert(result(tbl) === Set((1L, 111L, "a")))
  }

  test("NOT MATCHED BY SOURCE UPDATE touches only source-absent rows") {
    val tbl = freshTarget(Seq((1L, 10L, "a"), (2L, 20L, "b")))
    import spark.implicits._
    Seq((1L, 100L)).toDF("k", "nv").createOrReplaceTempView("merge_src")
    spark.sql(
      s"""MERGE INTO $tbl t USING merge_src s ON t.k = s.k
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET tag = 'stale'""".stripMargin)
    assert(result(tbl) === Set((1L, 10L, "a"), (2L, 20L, "stale")))
  }

  test("star forms: UPDATE SET * / INSERT * resolve through the rewrite") {
    val tbl = freshTarget(Seq((1L, 10L, "a"), (2L, 20L, "b")))
    import spark.implicits._
    // source schema matches the target column-for-column (star contract)
    Seq((2L, 200L, "B"), (3L, 300L, "C")).toDF("k", "v", "tag")
      .createOrReplaceTempView("merge_src")
    spark.sql(
      s"""MERGE INTO $tbl t USING merge_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(result(tbl) === Set(
      (1L, 10L, "a"), (2L, 200L, "B"), (3L, 300L, "C")))
  }

  test("ambiguous match (two source rows per target row) errors") {
    val tbl = freshTarget(Seq((1L, 10L, "a")))
    import spark.implicits._
    Seq((1L, 100L), (1L, 200L)).toDF("k", "nv").createOrReplaceTempView("merge_src")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $tbl t USING merge_src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(_.contains("more than one source row"))))
    // and the table is untouched (the check ran before any write)
    assert(result(tbl) === Set((1L, 10L, "a")))
  }

  test("merge result hash-stable across reruns (CoW rewrite deterministic)") {
    def run(): Set[(Long, Long, String)] = {
      val tbl = freshTarget(Seq((1L, 10L, "x"), (2L, 20L, "y")))
      import spark.implicits._
      Seq((2L, 200L), (3L, 300L)).toDF("k", "nv").createOrReplaceTempView("merge_src")
      spark.sql(
        s"""MERGE INTO $tbl t USING merge_src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET v = s.nv
           |WHEN NOT MATCHED THEN INSERT (k, v, tag) VALUES (s.k, s.nv, 'new')""".stripMargin)
      result(tbl)
    }
    assert(run() === run())
  }
}
