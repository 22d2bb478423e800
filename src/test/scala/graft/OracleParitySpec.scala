package graft

import org.scalatest.funsuite.AnyFunSuite

/** Local mirror of the driver's DuckDB correctness gate (VERDICT r7
  * missing #3): m10's oracle-side type drift survived three rounds
  * because nothing in `sbt test` asserted "every `SparkEntry.oracleSql`
  * entry actually hash-matches DuckDB". This dumps every query at
  * sf0.001 and runs `tools/check.py` — the exact canonicalizer the
  * driver uses — so an engine/oracle divergence fails the suite the
  * session it is introduced. Cancels (not fails) where python3+duckdb
  * aren't installed; they are driver-side tooling, not an engine dep.
  */
class OracleParitySpec extends AnyFunSuite with SparkTestBase {

  import scala.sys.process._

  private lazy val oracleToolingPresent: Boolean =
    try Seq("python3", "-c", "import duckdb, pandas").! == 0
    catch { case _: Throwable => false }

  test("every SparkEntry query hash-matches its DuckDB oracle at sf0.001") {
    assume(oracleToolingPresent, "python3 + duckdb not available")
    val out = java.nio.file.Files.createTempDirectory("graft_parity").toString
    val failedDumps = Verify.dump(spark, sf("sf0.001"), out, artifacts = false)
    assert(failedDumps.isEmpty, s"queries threw during dump: $failedDumps")
    val log = new StringBuilder
    val rc = Process(Seq("python3", "tools/check.py", sf("sf0.001"), out),
      new java.io.File(".")).!(ProcessLogger(l => log.append(l).append('\n')))
    val fails = log.toString.linesIterator
      .filter(l => l.startsWith("FAIL") || l.contains("EMPTY!")).toList
    assert(rc == 0 && fails.isEmpty,
      (fails :+ log.toString.linesIterator.toList.lastOption.getOrElse(""))
        .mkString("\n"))
  }
}
