package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one SparkEntry query at SPARK_GRAFT_SF_DIR and print its
  * physical plan as planned at that scale factor — the quickest way to see
  * which join strategy Catalyst picks when the inputs are NOT the sf0.1
  * fixture PlanDump snapshots (runtime AQE re-plans show up in
  * ProfileQuery's stage shapes). Usage: runMain graft.ExplainOne <query>
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tuning(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, d)
    df.write.format("noop").mode("overwrite").save()
    println("=== final physical plan (post-AQE) ===")
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
