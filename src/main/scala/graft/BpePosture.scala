package graft

import org.apache.spark.sql.SparkSession

/** Long-run BPE training posture (VERDICT r15 item 7): run the
  * production merge loop for 50/100/200 rounds over the sf0.1 corpus
  * and report seconds/round — the claim under test is that wall-time is
  * LINEAR in rounds (JobLinearitySpec already pins jobs/round constant;
  * this pins SECONDS, whose suspect constant is the per-round driver
  * argmax collect). A growing sec/round across the three points is the
  * lineage- or state-accumulation regression class.
  *
  * Usage: runMain graft.BpePosture <sfDir> [rounds ...]
  * Output: one JSON line {"rounds":{"50":sec,...},"sec_per_round":{...}}
  * → the BASELINE §8 BPE posture row.
  */
object BpePosture {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rounds = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(50, 100, 200)
    val spark = Tuning(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup: pay the one-time listing/JIT cost outside the measurement
    operators.Bpe.train(Tables.documents(spark, sfDir), 5).foreach(_ => ())
    val timed = rounds.map { r =>
      val t0 = System.nanoTime()
      val merges = operators.Bpe.train(Tables.documents(spark, sfDir), r)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      // merges < r means the vocabulary merged to exhaustion early —
      // then sec/round must normalize by the rounds actually run
      (r, math.min(merges, r.toLong), sec)
    }
    def f3(d: Double) = f"$d%.3f"
    val rJson = timed.map { case (r, _, s) => s""""$r":${f3(s)}""" }
      .mkString("{", ",", "}")
    val prJson = timed.map { case (r, ran, s) =>
      s""""$r":${f3(s / math.max(1L, ran))}""" }.mkString("{", ",", "}")
    val ranJson = timed.map { case (r, ran, _) => s""""$r":$ran""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"bpe_posture","sf":"$sfDir","rounds":$rJson,""" +
      s""""rounds_ran":$ranJson,"sec_per_round":$prJson}""")
    spark.stop()
  }
}
