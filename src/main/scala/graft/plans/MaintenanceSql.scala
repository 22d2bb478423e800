package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** SQL surface for the table-maintenance commands (sql25, r17) — the
  * statements an operator types, not a Scala API a pipeline imports:
  *
  * {{{
  * OPTIMIZE t                          -- compact over-fragmented dirs
  * OPTIMIZE t ZORDER BY (a, b)         -- …clustering the re-pack
  * OPTIMIZE t MAX FILES 8              -- …custom threshold
  * CHECKPOINT TABLE t                  -- collapse the commit log
  * CHECKPOINT TABLE t RETAIN 3         -- …keeping a longer txt tail
  * }}}
  *
  * Wired through `SparkSessionExtensions.injectParser` as a DELEGATING
  * parser: the two maintenance statements (which Spark's grammar does
  * not have) match on a pre-pass, everything else — every SELECT,
  * MERGE, UPDATE, windowed CTE, the whole sql1–sql24 surface — passes
  * to Spark's own parser verbatim. Each statement becomes a
  * `LeafRunnableCommand`, so `spark.sql(...)` executes it eagerly and
  * returns its metrics row, exactly how Spark's own utility commands
  * behave.
  */
object MaintenanceSql {

  private val optimizeRe =
    ("""(?is)^\s*OPTIMIZE\s+([\w.]+)""" +
      """(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?""" +
      """(?:\s+MAX\s+FILES\s+(\d+))?\s*;?\s*$""").r

  private val checkpointRe =
    """(?is)^\s*CHECKPOINT\s+TABLE\s+([\w.]+)(?:\s+RETAIN\s+(\d+))?\s*;?\s*$""".r

  /** The pre-pass: Some(command) when the text is a maintenance
    * statement, None to delegate.
    */
  def parseMaintenance(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case optimizeRe(table, zorder, maxFiles) =>
        val cols = Option(zorder).toSeq.flatMap(
          _.split(",").map(_.trim).filter(_.nonEmpty))
        Some(OptimizeTableCommand(table, cols,
          Option(maxFiles).map(_.toInt).getOrElse(4)))
      case checkpointRe(table, retain) =>
        Some(CheckpointTableCommand(table,
          Option(retain).map(_.toInt).getOrElse(1)))
      case _ => None
    }
}

/** `OPTIMIZE t [ZORDER BY (…)] [MAX FILES n]` → [[Compaction.compact]];
  * ZORDER BY takes one column (linear clustering), two (the 31-bit
  * dyadic Morton interleave — [[graft.functions.ZOrderLong]]), or up
  * to six ([[graft.functions.ZOrderN]], 62/n bits per lane); beyond
  * six it rejects loudly rather than silently degrading to a key that
  * no longer discriminates.
  */
case class OptimizeTableCommand(table: String, zorderBy: Seq[String],
    maxFiles: Int) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("dirs_compacted", IntegerType, nullable = false)(),
    AttributeReference("files_removed", IntegerType, nullable = false)(),
    AttributeReference("files_written", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val cluster = zorderBy match {
      case Seq() => Nil
      case Seq(one) => Seq(col(one))
      case Seq(a, b) => Seq(graft.functions.ZOrderLong.zorder(col(a), col(b)))
      case upTo6 if upTo6.size <= 6 =>
        // n-lane interleave: each lane keeps 62/n bits (3 → 20, 4 → 15…)
        Seq(graft.functions.ZOrderN.zorderN(upTo6.map(col): _*))
      case more => throw new IllegalArgumentException(
        s"OPTIMIZE ... ZORDER BY supports up to 6 columns, got " +
          s"${more.size} (${more.mkString(", ")}) — beyond 6 each lane " +
          "keeps under 10 bits and the key stops discriminating")
    }
    val (d, r, w) = Compaction.compact(spark, table,
      maxFilesPerDir = maxFiles, clusterBy = cluster)
    Seq(Row(d, r, w))
  }
}

/** `CHECKPOINT TABLE t [RETAIN n]` → [[TableCommit.checkpointLog]]. */
case class CheckpointTableCommand(table: String, retain: Int)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("manifests_collapsed", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseTableIdentifier(table))
    Seq(Row(TableCommit.checkpointLog(spark, meta, retainTxts = retain)))
  }
}

/** Delegating parser: maintenance statements short-circuit, everything
  * else goes to Spark's parser untouched.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    MaintenanceSql.parseMaintenance(sqlText)
      .getOrElse(delegate.parsePlan(sqlText))

  // parameterized spark.sql(text, args) routes HERE, not parsePlan —
  // the trait's default ignores the ParameterContext (leaving
  // UNBOUND_SQL_PARAMETER at analysis), so it must delegate explicitly
  override def parsePlanWithParameters(sqlText: String,
      parameters: org.apache.spark.sql.catalyst.parser.ParameterContext)
      : LogicalPlan =
    MaintenanceSql.parseMaintenance(sqlText)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, parameters))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)

  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)

  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)

  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)

  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)

  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)

  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
