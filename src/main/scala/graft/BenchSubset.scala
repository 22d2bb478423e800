package graft
import org.apache.spark.sql.SparkSession
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = Tuning(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- args) {
      spark.catalog.clearCache() // cold-cache per query, like Bench proper
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"$n%-24s ${(System.nanoTime()-t0)/1e9}%7.2f s")
    }
    spark.stop()
  }
}
