package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Head-to-head for the two-level prefix sum (BASELINE §8, VERDICT r7
  * perf #1): times m4's shipped sharded form against the naive
  * single-window-per-source form on the same input, same protocol as
  * BenchSubset (warmup + lower-median of 3, noop sink). The naive form
  * is what the engine shipped before round 8 — one task per source —
  * and exists here only as the measured counterfactual.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 sbt "runMain graft.BenchPrefixSum"
  */
object BenchPrefixSum {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tuning(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def naive(s: SparkSession, d: String) = {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_toks").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast(LongType).as("n_toks"))
        .withColumn("cum_toks", sum(col("n_toks")).over(w))
        .filter(col("cum_toks") <= 5000)
        .select(col("doc_id"), col("source"), col("n_toks"), col("cum_toks"))
    }
    val forms: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq("m4_sharded" -> ((s, d) => SparkEntry.queries("m4_token_budget")(s, d)),
          "m4_naive_window" -> (naive _))

    for ((name, fn) <- forms) {
      def once(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val warm = once()
      val med = Seq.fill(3)(once()).sorted.apply(1)
      println(f"$name%-18s median ${med}%7.2f s  (warmup ${warm}%7.2f)")
    }
    spark.stop()
  }
}
