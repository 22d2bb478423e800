package graft

import graft.pipeline.{ChessPipeline, EtlConfig}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end incremental chess pipeline (R4/R11 via AvailableNow) and
  * the R12 config loader.
  */
class IncrementalPipelineSpec extends AnyFunSuite with SparkTestBase {

  test("streaming pipeline processes each raw file exactly once (R4/R11)") {
    val raw = java.nio.file.Files.createTempDirectory("chess_raw")
    val out = java.nio.file.Files.createTempDirectory("chess_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("chess_ckpt").toString

    def game(id: String): String =
      s"""{"id":"$id","variant":"standard","status":"mate","winner":"white","moves":"e4 e5","players":{"white":{"user":{"name":"w"}},"black":{"user":{"name":"b"}}},"opening":{"eco":"C20","name":"KP"}}"""
    def countGames(): Long =
      spark.read.text(out).filter("value like '[Game ID%'").count()

    java.nio.file.Files.write(raw.resolve("f1.ndjson"),
      (game("a1") + "\n" + game("a2")).getBytes)
    ChessPipeline.runStream(spark, raw.toString, out, ckpt)
    assert(countGames() === 2)

    // second run with one new file: only the new games are appended
    java.nio.file.Files.write(raw.resolve("f2.ndjson"), game("b1").getBytes)
    ChessPipeline.runStream(spark, raw.toString, out, ckpt)
    assert(countGames() === 3) // 3, not 5 — f1 not reprocessed
  }

  test("EtlConfig parses the reference's yaml shape (R12)") {
    val f = java.nio.file.Files.createTempFile("etl", ".yml")
    java.nio.file.Files.write(f,
      """# spark config
        |master: local[2]
        |executor_memory: 2g
        |executor_cores: 3
        |raw_data_path: /data/raw
        |transformed_data_path: /data/out
        |""".stripMargin.getBytes)
    val c = EtlConfig.fromYaml(f.toString)
    assert(c.master === "local[2]")
    assert(c.executorMemory === "2g")
    assert(c.executorCores === 3)
    assert(c.rawDataPath === "/data/raw")
    assert(c.transformedDataPath === "/data/out")
    assert(c.checkpointPath === "data/checkpoints") // default
  }
}
