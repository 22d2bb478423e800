package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tuning}

/** Ad-hoc probe: run a query under candidate spill-forcing confs and
  * print the summed diskBytesSpilled. Harness tooling only.
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val dir = args(1)
    val spark = Tuning(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(2).foreach { a =>
      val Array(k, v) = a.stripPrefix("conf=").split(":", 2)
      spark.conf.set(k, v)
    }
    val disk = new java.util.concurrent.atomic.AtomicLong(0)
    val mem = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          disk.addAndGet(te.taskMetrics.diskBytesSpilled)
          mem.addAndGet(te.taskMetrics.memoryBytesSpilled)
        }
    })
    val n = SparkEntry.queries(q)(spark, dir).collect().length
    org.apache.spark.GraftSparkInternals.drainListenerBus(spark.sparkContext, 10000)
    println(s"PROBE rows=$n diskSpilled=${disk.get} memSpilled=${mem.get}")
    spark.stop()
  }
}
