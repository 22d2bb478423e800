package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: bounded-interval range joins plan as BUCKETED equi
  * joins by default (VERDICT r4 item 7 — the hand-built j7b rewrite,
  * promoted to the planner so the NAIVE formulation gets the scalable
  * plan).
  *
  * Matches an inner join whose condition contains, for a timestamp
  * expression `a` of one side and `b` of the other,
  *
  *   b > a  (or >=)   AND   b <= a + W  (or <, W a literal interval > 0)
  *
  * — the "events within a window after each event" shape
  * (`Joins.scala` j7; reference: the puzzle-pairing window of
  * /root/reference/etl/transform.py has no analogue, this is engine
  * inventory). Such a join would otherwise hash only on any remaining
  * equi keys (user_id), putting a whole key-group's history into one
  * task — quadratic in group size and skew-prone at 100 TB.
  *
  * The rewrite derives a width-W time bucket on each side and adds a
  * bucket-equality conjunct: `b`'s side keeps its single bucket, `a`'s
  * side explodes to probe {bkt(a), bkt(a)+W} — sound because
  * b ∈ (a, a+W] implies truncDiv(b,W) ∈ {truncDiv(a,W), truncDiv(a,W)+1}
  * (truncating division is monotone and truncDiv(x+W,W) = truncDiv(x,W)+1
  * for any sign of x). The original condition stays as the exact
  * residual, so results are identical — j7's oracle hash is the gate.
  * Candidates per task are bounded by two buckets' worth per probe row
  * regardless of key-group cardinality.
  *
  * Conservative by construction: inner joins only, batch only (streaming
  * interval joins carry watermark semantics the rule must not touch),
  * deterministic bound expressions, literal width. Buckets are epoch
  * SECONDS (ceil of W): a sub-second W still gets a 1 s bucket — wider
  * buckets only admit more candidates for the residual to reject, never
  * fewer. The `graft_range_bkt` marker makes the rule idempotent (and
  * lets a hand-bucketed plan like j7b opt out by using the marker name).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val Marker = "graft_range_bkt"

  /** Idempotent session registration (same pattern as AsOfJoinApi). */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _)
        if !j.isStreaming &&
          !cond.references.exists(_.name.startsWith(Marker)) &&
          !left.output.exists(_.name.startsWith(Marker)) &&
          !right.output.exists(_.name.startsWith(Marker)) =>
      tryRewrite(j).getOrElse(j)
  }

  private def split(e: Expression): Seq[Expression] = e match {
    case And(a, b) => split(a) ++ split(b)
    case o => Seq(o)
  }

  private def isTimestamp(t: DataType): Boolean =
    t == TimestampType || t == TimestampNTZType

  private def widthMicros(l: Literal): Option[Long] = l match {
    case Literal(v: Long, _: DayTimeIntervalType) if v > 0 => Some(v)
    case _ => None
  }

  private def tryRewrite(j: Join): Option[LogicalPlan] = {
    val conj = split(j.condition.get)
    // lower bounds, normalized to b > a / b >= a as (a, b)
    val lowers = conj.collect {
      case GreaterThan(b, a) => (a, b)
      case GreaterThanOrEqual(b, a) => (a, b)
      case LessThan(a, b) => (a, b)
      case LessThanOrEqual(a, b) => (a, b)
    }
    // upper bounds, normalized to b <= a + W / b < a + W as (a, b, W)
    val uppers = conj.collect {
      case LessThanOrEqual(b, TimestampAddInterval(a, l: Literal, _)) => (a, b, l)
      case LessThan(b, TimestampAddInterval(a, l: Literal, _)) => (a, b, l)
      case GreaterThanOrEqual(TimestampAddInterval(a, l: Literal, _), b) => (a, b, l)
      case GreaterThan(TimestampAddInterval(a, l: Literal, _), b) => (a, b, l)
    }
    val matches = for {
      (la, lb) <- lowers
      (ua, ub, l) <- uppers
      w <- widthMicros(l)
      if la.semanticEquals(ua) && lb.semanticEquals(ub)
      if isTimestamp(la.dataType) && isTimestamp(lb.dataType)
      if la.deterministic && lb.deterministic
    } yield (la, lb, w)
    matches.headOption.flatMap { case (a, b, w) =>
      val left = j.left; val right = j.right
      if (a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet))
        Some(build(j, a, b, w, probeIsLeft = true))
      else if (a.references.subsetOf(right.outputSet) &&
          b.references.subsetOf(left.outputSet))
        Some(build(j, a, b, w, probeIsLeft = false))
      else None
    }
  }

  private def build(j: Join, a: Expression, b: Expression, wMicros: Long,
      probeIsLeft: Boolean): LogicalPlan = {
    val (probe, bld) = if (probeIsLeft) (j.left, j.right) else (j.right, j.left)
    val wSec = Literal(math.max(1L, (wMicros + 999999L) / 1000000L))
    // truncDiv(epochSec, W) * W, via x - x % W (Subtract/Remainder share
    // truncation semantics with IntegralDivide, and comparing multiples
    // is equivalent to comparing quotients)
    def bucket(ts: Expression): Expression = {
      val s = Cast(ts, LongType)
      new Subtract(s, new Remainder(s, wSec))
    }
    val bktProbe = AttributeReference(Marker + "_p", LongType)()
    val gen = Generate(
      Explode(CreateArray(Seq(bucket(a), new Add(bucket(a), wSec)))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bktProbe), child = probe)
    val bktBuild = Alias(bucket(b), Marker + "_b")()
    val proj = Project(bld.output :+ bktBuild, bld)
    val (l2, r2): (LogicalPlan, LogicalPlan) =
      if (probeIsLeft) (gen, proj) else (proj, gen)
    val newJoin = Join(l2, r2, Inner,
      Some(And(j.condition.get, EqualTo(bktProbe, bktBuild.toAttribute))),
      j.hint)
    // restore the original output (drop the bucket columns)
    Project(j.output, newJoin)
  }
}
