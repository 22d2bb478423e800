package graft

import graft.pipeline.ChessPipeline
import graft.sources.Pgn
import org.scalatest.funsuite.AnyFunSuite

/** Reference-parity tests: R5–R10 semantics + the S7 golden PGN. */
class ChessPipelineSpec extends AnyFunSuite with SparkTestBase {

  private lazy val games =
    ChessPipeline.puzzleGames(spark, ChessPipeline.samplePath)

  test("SparkEntry.entry returns rows (driver t1 smoke surface)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("filter keeps only mate+standard games (R7)") {
    assert(games.collect().map(_.game_id).sorted.toSeq ===
      Seq("game0001", "game0002", "game0007", "game0008", "game0010"))
  }

  test("nested projection is total on missing structs (R8/P2/P6)") {
    val byId = games.collect().map(g => g.game_id -> g).toMap
    assert(byId("game0007").white_name.isEmpty) // anonymous player
    assert(byId("game0007").black_name.contains("mia"))
    assert(byId("game0008").opening_eco.isEmpty) // opening struct absent
    assert(byId("game0001").winner.contains("white"))
  }

  test("PGN rendering matches the golden file (S7/R10)") {
    val got = Pgn.renderToString(games)
    val want = scala.io.Source.fromResource("graft/golden.pgn").mkString
    assert(got === want)
  }

  test("PGN DSv2 round trip preserves every field incl. nulls") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("pgn_rt").toString
    games.toDF().write.format("pgn").mode("overwrite").save(out)
    val back = spark.read.format("pgn").load(out)
      .as[graft.sources.PuzzleGame].collect()
      .sortBy(_.game_id)
    val want = games.collect().sortBy(_.game_id)
    assert(back.toSeq === want.toSeq)
    // pruned scan only materializes requested columns (pushed into scan)
    val pruned = spark.read.format("pgn").load(out).select("game_id")
    val desc = pruned.queryExecution.executedPlan.toString
    assert(pruned.collect().map(_.getString(0)).sorted ===
      want.map(_.game_id).sorted)
    assert(desc.contains("columns=game_id"), desc)
  }

  test("PGN sink writes once per partition via committer, content preserved") {
    val out = java.nio.file.Files.createTempDirectory("pgn_sink").toString
    Pgn.write(games, out)
    val back = spark.read.text(out)
    assert(back.filter("value like '[Game ID%'").count() === 5)
  }

  test("DSV2 format(\"pgn\") writes committed per-partition pgn files") {
    val out = java.nio.file.Files.createTempDirectory("pgn_dsv2").toString
    games.toDF().coalesce(1).write.mode("overwrite")
      .format("graft.sources.pgn.PgnDataSource").save(out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".pgn"))
    assert(files.length === 1)
    val content = new String(java.nio.file.Files.readAllBytes(files.head.toPath))
    assert(content.split("\\[Game ID").length - 1 === 5)
    assert(!content.contains(".tmp"))
  }

  test("observed metrics ride the sink job — no extra count scans (R6)") {
    val out = java.nio.file.Files.createTempDirectory("pgn_obs").toString
    val metrics = ChessPipeline.runWithMetrics(spark, ChessPipeline.samplePath, out)
    assert(metrics.get("n_games") === Some(5L))
    assert(metrics.get("n_decided") === Some(5L))
  }

  test("fixed schema agrees with inference on every touched field (S2≡S3)") {
    import org.apache.spark.sql.functions._
    val cols = Seq(col("id"), col("status"), col("variant"), col("winner"),
      col("players.white.user.name"), col("players.black.user.name"),
      col("opening.eco"), col("opening.name"), size(col("clocks")))
    val fixed = ChessPipeline.readGames(spark, ChessPipeline.samplePath).select(cols: _*)
    val inferred = spark.read.json(ChessPipeline.samplePath).select(cols: _*)
    assert(fixed.except(inferred).count() === 0)
    assert(inferred.except(fixed).count() === 0)
  }
}
