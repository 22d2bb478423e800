package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's `private[sql]` Column↔Expression conversions, so
  * graft's native Catalyst expressions can be exposed as `Column`s.
  * (Spark 4 removed the public `new Column(expr)` constructor; this is
  * the minimal sanctioned-namespace shim — same trick every Spark
  * extension library uses.)
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a custom LogicalPlan (private[sql] Dataset.ofRows). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].logicalPlan

  /** Session Hadoop conf (private[sql] sessionState), for commands that
    * talk to the table's FileSystem directly (the pruned CoW commit).
    */
  def hadoopConf(spark: org.apache.spark.sql.SparkSession)
      : org.apache.hadoop.conf.Configuration =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.newHadoopConf()

  /** Recompute-or-drop catalog size stats after a manual file-level
    * commit — the same call Spark's own InsertIntoHadoopFsRelation
    * command makes, so stale sizeInBytes can't mislead later broadcast
    * decisions.
    */
  def updateTableStats(spark: org.apache.spark.sql.SparkSession,
      table: org.apache.spark.sql.catalyst.catalog.CatalogTable): Unit =
    org.apache.spark.sql.execution.command.CommandUtils.updateTableStats(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], table)

  /** Hive-layout partition-path unescaping (private[spark] in the
    * external catalog) — the pruned MERGE commit derives minted
    * partition specs from its own add paths, which use the same
    * escaping Spark's writers produce.
    */
  def unescapePathName(s: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .unescapePathName(s)
}
