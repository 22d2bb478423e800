package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: per-stage profile of one or more SparkEntry queries at
  * sf0.1 — tasks, run/cpu/GC millis, max task, shuffle bytes — the
  * instrumentation that found the cold-cache broadcast races and the
  * fixed per-task closure-deserialization cost (see ShingleHash's doc).
  * Usage: runMain graft.ProfileQuery <queryName> [rounds=5]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "l2c_shingle_jaccard"
    val rounds = if (args.length > 1) args(1).toInt else 5
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tuning(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark

    val taskMax = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        println(f"    [job ${js.jobId}%3d start @${js.time % 1000000}%6d]")
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        println(f"    [job ${je.jobId}%3d end   @${je.time % 1000000}%6d]")
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        taskMax.merge(te.stageId, te.taskInfo.duration, (a, b) => math.max(a, b))
      override def onStageCompleted(st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = st.stageInfo.taskMetrics
        println(f"    [stage ${st.stageInfo.stageId}%3d] tasks=${st.stageInfo.numTasks}%3d " +
          f"runMs=${m.executorRunTime}%6d cpuMs=${m.executorCpuTime / 1000000}%6d " +
          f"gcMs=${m.jvmGCTime}%5d maxTaskMs=${taskMax.getOrDefault(st.stageInfo.stageId, -1L)}%5d " +
          f"shWrMB=${m.shuffleWriteMetrics.bytesWritten / 1048576.0}%6.1f ${st.stageInfo.name.take(40)}")
      }
    })

    for (round <- 1 to rounds) {
      s.catalog.clearCache(); System.gc(); Thread.sleep(500)
      println(s"=== $name round $round ===")
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(s, d)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force optimize + physical planning
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"[prof] build ${(t1 - t0) / 1e9}%6.3f s  plan ${(t2 - t1) / 1e9}%6.3f s  exec ${(t3 - t2) / 1e9}%6.3f s  FULL ${(t3 - t0) / 1e9}%7.3f s")
      Thread.sleep(400)
    }
    spark.stop()
  }
}
