package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** PGN rendering + sink (SURVEY.md §2A R10, S7) — the reference's
  * `write_to_pgn` (/root/reference/etl/transform.py:36-54) re-expressed
  * as a pure `PuzzleGame => String` function over a typed Dataset,
  * written through Spark's committer instead of concurrent appends to a
  * shared file (the reference's race, SURVEY §4.2 — deliberately fixed).
  *
  * Deviations from the reference, by design:
  *  - game numbering is global and deterministic (ascending game_id),
  *    not a per-partition counter;
  *  - null fields render as "?" (PGN convention), not Python's "None".
  */
object Pgn {

  /** One PGN block, exactly the reference's tag layout. */
  def render(g: PuzzleGame, n: Long): String = {
    def t(v: Option[String]) = v.getOrElse("?")
    s"""[Game $n]
       |[Game ID "${g.game_id}"]
       |[White "${t(g.white_name)}"]
       |[Black "${t(g.black_name)}"]
       |[Opening Eco "${t(g.opening_eco)}"]
       |[Opening Name "${t(g.opening_name)}"]
       |[Game Winner "${t(g.winner)}"]
       |
       |${t(g.moves)}""".stripMargin
  }

  /** Deterministically numbered PGN blocks (sorted by game_id). The
    * global numbering needs a total order: zipWithIndex keeps it
    * distributed (two passes, no single-partition collapse).
    */
  def renderAll(games: Dataset[PuzzleGame]): Dataset[String] = {
    val spark = games.sparkSession
    import spark.implicits._
    val numbered = games.orderBy("game_id").rdd.zipWithIndex()
      .map { case (g, i) => render(g, i + 1) }
    spark.createDataset(numbered)
  }

  /** Write one .pgn-part per partition via the file committer (atomic,
    * idempotent under task retry — the R10 fix).
    */
  def write(games: Dataset[PuzzleGame], outDir: String): Unit =
    renderAll(games).write.mode("overwrite").text(outDir)

  /** The whole output as a single string (golden-file tests). Games are
    * separated by a blank line, like the reference's writer.
    */
  def renderToString(games: Dataset[PuzzleGame]): String =
    renderAll(games).collect().mkString("\n\n") + "\n"
}
