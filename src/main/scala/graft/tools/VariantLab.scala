package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tuning}

/** Dev scratch: A/B-time alternative plan shapes for the expensive
  * pinned-subset queries before committing a change. Not part of any
  * gate; kept in tools so the experiments are reproducible.
  * Usage: runMain graft.tools.VariantLab <which> [rounds]
  */
object VariantLab {
  def main(args: Array[String]): Unit = {
    val which = if (args.nonEmpty) args(0) else "l14"
    val rounds = if (args.length > 1) args(1).toInt else 5
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tuning(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark

    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      for (r <- 1 to rounds) {
        s.catalog.clearCache()
        val t0 = System.nanoTime()
        val df = mk
        df.write.format("noop").mode("overwrite").save()
        val t1 = System.nanoTime()
        println(f"[lab] $tag%-28s round $r FULL ${(t1 - t0) / 1e9}%7.3f s")
      }
    }

    // Each round uses clearCache + a fresh plan build, so cache-gated
    // and bare variants pay their true per-invocation cost. To A/B a
    // plan change, time the entry here, apply the change, re-time —
    // e.g. the r11 l14/l15 cache-gate removal measured 0.79→0.60 s
    // (l14) and 1.15→0.85 s (l15) at sf0.1 with this tool.
    time(s"$which") { SparkEntry.queries(which)(s, d) }
    spark.stop()
  }
}
