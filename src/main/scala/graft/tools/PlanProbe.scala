package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tuning}

/** Ad-hoc plan/stage probe for skew diagnosis: prints the AQE final
  * plan of a named query on a fixture dir. Harness tooling only.
  *
  * Usage: sbt "runMain graft.tools.PlanProbe <query> <dir> [conf=k:v ...]"
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val dir = args(1)
    val spark = Tuning(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(2).foreach { a =>
      val Array(k, v) = a.stripPrefix("conf=").split(":", 2)
      spark.conf.set(k, v)
    }
    val df = SparkEntry.queries(q)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
