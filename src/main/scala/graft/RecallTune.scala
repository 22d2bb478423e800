package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: sweep the ANN recall/cost dials (LSH tables/bits/probeFlips,
  * IVF nlist/nprobe) against the exact top-k at a given SF, printing
  * recall@k and wall seconds per configuration — the measurement behind
  * the defaults SparkEntry ships (VERDICT r4 asked for ≥0.9 recall@3 on
  * at least one path with the cost dial documented).
  * Usage: runMain graft.RecallTune [sfDir]
  */
object RecallTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Tuning(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val k = 3
    def pairs(df: DataFrame): Set[(Long, Long)] = df
      .select(col("vec_id"), col("neighbor")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val emb = Tables.embeddings(spark, sfDir)
    val exact = pairs(operators.Similarity.bruteTopK(emb, k))

    def eval(name: String, df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val got = pairs(df)
      val dt = (System.nanoTime() - t0) / 1e9
      val recall = (got & exact).size.toDouble / math.max(exact.size, 1)
      println(f"[tune] $name%-36s recall@$k=$recall%.4f  ${dt}%6.2f s  cand_returned=${got.size}")
    }

    val lshConfigs = sys.env.get("TUNE_LSH") match {
      case Some(s) => s.split(";").toSeq.map { c =>
        val Array(t, b, f) = c.split(",").map(_.trim.toInt); (t, b, f) }
      case None => Seq((16, 8, 4), (32, 8, 3), (16, 8, 3))
    }
    for ((t, b, f) <- lshConfigs)
      eval(s"lsh tables=$t bits=$b flips=$f",
        operators.Similarity.annTopK(emb, k, bits = b, tables = t, probeFlips = f))

    if (!sys.env.contains("TUNE_LSH"))
      for ((nl, np) <- Seq((16, 10), (16, 12)))
        eval(s"ivf nlist=$nl nprobe=$np",
          operators.Similarity.ivfTopK(emb, k, nlist = nl, nprobe = np))

    spark.stop()
  }
}
