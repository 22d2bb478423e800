package graft
import org.apache.spark.sql.SparkSession
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tuning(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Bench-protocol shape per query: one warmup (first-touch codegen /
    // listing / broadcast build), then timed passes, lower-median.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    for (n <- args) {
      def once(): Double = {
        spark.catalog.clearCache() // cold cache per pass, like Bench proper
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val warm = once()
      val med = Seq.fill(passes)(once()).sorted.apply((passes - 1) / 2)
      println(f"$n%-24s median ${med}%7.2f s  (warmup ${warm}%7.2f)")
    }
    spark.stop()
  }
}
