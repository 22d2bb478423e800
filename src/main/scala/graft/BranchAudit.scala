package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftbridge.ColumnBridge
import java.nio.file.{Files, Paths}

/** MECHANICAL BRANCH-LIVENESS AUDIT (VERDICT r13 item 9): the w16 slip
  * — a `coalesce(new_users, 0)` gap arm that never fired at any fixture
  * SF because the spine bounds made it structurally vacuous — survived
  * the manual per-entry audit AND the hash gate (the oracle mirrored
  * the same bounds). This tool makes that class of vacuity visible
  * mechanically: for every `SparkEntry.queries` entry it walks the
  * ANALYZED plan (the user-written shape, before the optimizer folds
  * anything), finds each conditional site (CaseWhen, If, multi-arg
  * Coalesce), derives per-arm HIT indicators (arm i of a CASE fires
  * when its condition is TRUE and every earlier one is not; arm i of a
  * COALESCE supplies the value when all earlier args are NULL and it
  * is not), and counts rows per arm by evaluating the indicators over
  * the site's child subplan — one batched aggregate per (entry, child).
  *
  * A zero-hit arm is flagged DEAD unless allowlisted with a reason
  * (error-guard arms like assert_true's raise path are dead BY DESIGN
  * in a passing run). Sites whose conditional cannot be row-evaluated
  * against a single child (spans both join sides, or wraps an
  * aggregate result inline) are reported as `skipped` rather than
  * silently ignored — no silent caps.
  *
  * Usage: runMain graft.BranchAudit <sfDir> <outJson> [entry ...]
  * Exit: prints a summary line; the JSON carries per-arm rows. The
  * round artifact is BRANCHES_r{N}.json.
  */
object BranchAudit {

  /** (entry-name pattern, expression-SQL fragment, reason) triples for
    * arms that are legitimately dead in a green run.
    */
  private val allowlist: Seq[(String, String, String)] = Seq(
    ("*", "assert_true", "error-guard arm: fires only on contract violation"),
    ("*", "raise_error", "error-guard arm: fires only on contract violation"),
    // the fixture has events on EVERY day at every SF, so a 7-day
    // rolling window can never see an empty day: the gap arm is
    // fixture-vacuous, not structurally vacuous (w16's arm, by
    // contrast, fires on zero-NEW-USER days, which do exist)
    ("w13_rolling_distinct", "coalesce(au7, 0",
      "every fixture day has activity; arm fires only on gap days"),
    // the fixture user×event_type grid is fully dense at every SF
    // (15×5 and 150×5 checked), so na.fill's zero arm cannot fire
    ("a10_pivot", "coalesce(",
      "na.fill arm: fires only for user,type combos absent from the grid; fixture grid is dense"),
    ("j12b_fuzzy_join2", "length(",
      "defensive empty-string guard; fixture names are never empty"),
    ("l16_line_dedup", "coalesce(",
      "defensive null guard; fixture text/segments are non-null"),
    // canonicalUrl's default-port/empty-param-set arms: the synthetic
    // fixture URLs are https with params, but PropertySpec's URL law
    // drives these arms with generated http/:80/no-param vectors
    ("l17_url_dedup", "regexp_extract",
      "kernel arm exercised by PropertySpec's generated URL vectors"),
    ("l17_url_dedup", "array_join(sort_array",
      "empty-param-set arm exercised by PropertySpec's generated URL vectors"),
    ("l23_repetition_stats", "size(t) <",
      "short-input guard; every fixture document has >=2 tokens"),
    ("l25_span_corruption", "size(t) <",
      "short-input guard; every fixture document has >=8 tokens"),
    // a data-quality EXPECTATIONS entry counts violations: zero on the
    // clean fixture is the asserted-healthy outcome, not vacuity
    ("m19_expectations", "CASE WHEN",
      "expectation violation counters are zero on a clean fixture by design")
  )

  private def allowlisted(entry: String, exprSql: String): Option[String] =
    allowlist.collectFirst {
      case (e, frag, reason)
        if (e == "*" || e == entry) &&
          exprSql.toLowerCase.contains(frag.toLowerCase) => reason
    }

  /** Per-arm hit indicators for one conditional expression. */
  private def arms(e: Expression): Seq[(String, Expression)] = {
    def isTrue(c: Expression) = Coalesce(Seq(c, Literal(false)))
    e match {
      case CaseWhen(branches, elseValue) =>
        val conds = branches.map(_._1)
        val hits = conds.zipWithIndex.map { case (c, i) =>
          val earlierMiss = conds.take(i)
            .map(ec => Not(isTrue(ec))).reduceOption(And).getOrElse(Literal(true))
          (s"when$i", And(earlierMiss, isTrue(c)))
        }
        val allMiss = conds.map(c => Not(isTrue(c))).reduce(And)
        if (elseValue.isDefined) hits :+ ("else", allMiss) else hits
      case If(p, _, _) =>
        Seq(("then", isTrue(p)), ("else", Not(isTrue(p))))
      case Coalesce(children) if children.size > 1 =>
        children.zipWithIndex.map { case (c, i) =>
          val earlierNull = children.take(i)
            .map(IsNull(_): Expression).reduceOption(And).getOrElse(Literal(true))
          (s"arg$i", And(earlierNull, IsNotNull(c)))
        }
      case _ => Nil
    }
  }

  private case class Site(entry: String, node: String, exprSql: String,
      child: LogicalPlan, armExprs: Seq[(String, Expression)])

  /** Conditional sites of one analyzed plan, deduped by expression SQL
    * (aliases make the same expression surface in several layers).
    */
  private def sitesOf(entry: String, plan: LogicalPlan)
      : (Seq[Site], Seq[(String, String)]) = {
    val seen = scala.collection.mutable.Set[String]()
    val out = scala.collection.mutable.ArrayBuffer[Site]()
    val skipped = scala.collection.mutable.ArrayBuffer[(String, String)]()
    plan.foreach { node =>
      val conditionals = node.expressions.flatMap(_.collect {
        case c: CaseWhen => c: Expression
        case c: If => c: Expression
        case c: Coalesce if c.children.size > 1 => c: Expression
      })
      conditionals.foreach { e =>
        val sql = try e.sql catch { case _: Throwable => e.toString }
        if (!seen(sql)) {
          seen += sql
          val hasAgg = e.exists(_.isInstanceOf[AggregateExpression])
          // a branch of a With common-expression cannot be evaluated
          // standalone (its CommonExpressionRef has no definition here)
          val hasCER = e.exists(
            _.getClass.getSimpleName.startsWith("CommonExpressionRef"))
          val evalChild = node.children.find(c => e.references.subsetOf(c.outputSet))
          if (hasAgg || hasCER || !e.deterministic) skipped += ((sql.take(160),
            if (hasAgg) "wraps an aggregate result"
            else if (hasCER) "references a With common-expression"
            else "non-deterministic"))
          else evalChild match {
            case Some(ch) =>
              out += Site(entry, node.nodeName, sql, ch, arms(e))
            case None => skipped += ((sql.take(160),
              "references span multiple children"))
          }
        }
      }
    }
    (out.toSeq, skipped.toSeq)
  }

  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outJson = args(1)
    val only = args.drop(2).toSet
    val spark = Tuning(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val entries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.isEmpty || only(kv._1))
    val results = scala.collection.mutable.ArrayBuffer[String]()
    var deadCount = 0
    var siteCount = 0
    entries.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val (sites, skipped) = sitesOf(name, df.queryExecution.analyzed)
        siteCount += sites.size
        // one aggregate job per distinct child subplan, all arms batched
        val evalSkipped = scala.collection.mutable.ArrayBuffer[(String, String)]()
        val armRows = sites.groupBy(_.child).toSeq.flatMap { case (child, ss) =>
          try {
            val childDf = ColumnBridge.ofRows(spark, child)
            val flat = ss.flatMap(s => s.armExprs.map(a => (s, a._1, a._2)))
            val aggCols = flat.map { case (_, _, ind) =>
              org.apache.spark.sql.functions.sum(
                org.apache.spark.sql.functions.when(
                  ColumnBridge.column(ind), 1L).otherwise(0L))
            }
            val row = childDf.agg(aggCols.head, aggCols.tail: _*).head()
            flat.zipWithIndex.map { case ((s, armName, _), i) =>
              (s, armName, if (row.isNullAt(i)) 0L else row.getLong(i))
            }
          } catch {
            case t: Throwable =>
              ss.foreach(s => evalSkipped += ((s.exprSql.take(160),
                s"not evaluable standalone: ${String.valueOf(t.getMessage).take(80)}")))
              Nil
          }
        }
        val armJson = armRows.map { case (s, armName, hits) =>
          val status =
            if (hits > 0) "live"
            else allowlisted(name, s.exprSql)
              .map(r => s"allowlisted: $r").getOrElse { deadCount += 1; "DEAD" }
          s"""{"node": ${q(s.node)}, "expr": ${q(s.exprSql.take(160))}, """ +
            s""""arm": ${q(armName)}, "hits": $hits, "status": ${q(status)}}"""
        }
        val skJson = (skipped ++ evalSkipped).map { case (sql, why) =>
          s"""{"expr": ${q(sql)}, "why": ${q(why)}}""" }
        results += s"${q(name)}: {\"arms\": [${armJson.mkString(",")}], " +
          s"\"skipped\": [${skJson.mkString(",")}]}"
      } catch {
        case t: Throwable =>
          results += s"${q(name)}: {\"error\": ${q(String.valueOf(t.getMessage).take(200))}}"
      }
    }
    val body = s"{\n${results.mkString(",\n")},\n" +
      s""""_summary": {"entries": ${entries.size}, "sites": $siteCount, "dead": $deadCount}}"""
    Files.writeString(Paths.get(outJson), body)
    println(s"BRANCH AUDIT: ${entries.size} entries, $siteCount sites, $deadCount DEAD arms -> $outJson")
    spark.stop()
  }
}
