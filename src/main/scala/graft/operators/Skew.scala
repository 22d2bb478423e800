package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4.3's 100 TB notes).
  *
  * First line of defense is AQE's skew-join split (enabled in the bench
  * session); this explicit salted join is the fallback for the cases AQE
  * can't rewrite — e.g. a skewed key feeding a non-SMJ join, or a
  * groupBy whose hot key saturates one task. The pattern: explode the
  * small side `saltFactor`× (one copy per salt), salt the big side's key
  * with a deterministic hash-derived salt, join on (key, salt).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, with the big side's hot keys
    * spread over `saltFactor` partitions. Result equals the unsalted
    * inner join (every big row meets exactly one replica of its match).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltFactor))
        .cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key. `agg` must be algebraic (sum/count/
    * min/max) — expressed as (partial, merge) column builders.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      saltFactor: Int = 32): DataFrame =
    df.withColumn("_salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))
}
