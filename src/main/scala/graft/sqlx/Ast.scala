package graft.sqlx

import scala.concurrent.duration.FiniteDuration

/** IR for the zenodb SQL dialect — mirrors the shape (not the code) of the
  * reference's `sql.Query` (/root/reference/sql/sql.go:161-195) and its two
  * expression algebras: measure/aggregate expressions
  * (/root/reference/expr/expr.go:83-124) and dimension expressions (goexpr,
  * registered in /root/reference/sql/sql.go:76-123).
  *
  * The IR sits ABOVE Catalyst: the planner lowers it to a plain DataFrame
  * chain and lets Catalyst do the optimizing.
  */

// ---------------------------------------------------------------------------
// Measure (aggregate) expressions — always evaluate to Double.
// ---------------------------------------------------------------------------

sealed trait MExpr

/** Reference to an inserted value (raw context) or stored field (re-agg). */
final case class MField(name: String) extends MExpr
/** A bare column in SELECT/HAVING before aggregate defaulting: `SELECT x` ⇒
  * SUM(x) against a raw stream, but against a subquery/stored table the
  * column's own aggregate kind is preserved (the SubMerge relation,
  * /root/reference/sql/sql.go:727-737 + planner/local.go:85-97). The planner
  * resolves this to a concrete MAgg before compilation.
  */
final case class MBare(name: String) extends MExpr
/** Literal field, e.g. `5.1 AS cval` (expr/constant.go:10-57). */
final case class MConst(v: Double) extends MExpr
/** SUM/MIN/MAX/COUNT/AVG over a value expr (expr/aggregates.go, expr/avg.go). */
final case class MAgg(op: AggOp, child: MExpr) extends MExpr
/** Weighted average: count += w, total += x*w (expr/avg.go:19-21,52-63). */
final case class MWAvg(x: MExpr, w: MExpr) extends MExpr
/** 5-arg percentile over raw values (expr/percentile.go); p in 0-100. */
final case class MPercentile(child: MExpr, p: MExpr, lo: Double, hi: Double,
                             precision: Int) extends MExpr
/** 2-arg percentile reusing another percentile field's sketch
  * (expr/percentile_optimized.go:11-55). */
final case class MPercentileOpt(child: MExpr, p: MExpr) extends MExpr
/** Conditional aggregation over a dim predicate (expr/if.go:16-111). */
final case class MIf(cond: DExpr, child: MExpr) extends MExpr
/** Values outside [lo,hi] treated as unset, not clamped (expr/bounded.go). */
final case class MBounded(child: MExpr, lo: Double, hi: Double) extends MExpr
/** Read the wrapped aggregate from a shifted bucket (expr/shift.go:16-92).
  * `offsetMillis` is the STORE-SIDE re-key offset — the NEGATION of the
  * SQL duration: the idiomatic `'-1h'` stores +3600000 (bucket t shows
  * t-1h's value = look-back), a positive SQL duration stores a negative
  * offset (look-forward, the reference's sign semantics via seq.go:244's
  * `shiftBack = -1 * Shift()`). */
final case class MShift(child: MExpr, offsetMillis: Long, suffix: String)
    extends MExpr
/** + - * / over aggregate results; / has the zenodb zero rule
  * (expr/calcs.go:24-31): x/0 = 0 if x==0 else MaxFloat64. */
final case class MArith(op: String, l: MExpr, r: MExpr) extends MExpr
/** < <= = <> >= > AND OR over aggregate values, producing 0/1
  * (expr/conds.go:3-90); AND/OR mean `> 0`. */
final case class MCond(op: String, l: MExpr, r: MExpr) extends MExpr
/** LN / LOG2 / LOG10 applied at read time (expr/math.go:11-98). */
final case class MMath(fn: String, child: MExpr) extends MExpr

sealed trait AggOp { def name: String }
object AggOp {
  case object Sum extends AggOp { val name = "SUM" }
  case object Min extends AggOp { val name = "MIN" }
  case object Max extends AggOp { val name = "MAX" }
  case object Count extends AggOp { val name = "COUNT" }
  case object Avg extends AggOp { val name = "AVG" }
}

// ---------------------------------------------------------------------------
// Dimension expressions — evaluated against dims (metadata), appear in WHERE,
// GROUP BY derived dims, and IF conditions. Mirror goexpr's surface.
// ---------------------------------------------------------------------------

sealed trait DExpr

final case class DCol(name: String) extends DExpr
/** Literal: String, java.lang.Double, java.lang.Long, java.lang.Boolean, null. */
final case class DConst(v: Any) extends DExpr
/** = <> != < <= > >= over dims (sql/sql.go:989-1120). */
final case class DCmp(op: String, l: DExpr, r: DExpr) extends DExpr
final case class DAnd(l: DExpr, r: DExpr) extends DExpr
final case class DOr(l: DExpr, r: DExpr) extends DExpr
final case class DNot(e: DExpr) extends DExpr
final case class DLike(e: DExpr, pattern: String, negated: Boolean) extends DExpr
final case class DIn(e: DExpr, values: Seq[Any], negated: Boolean) extends DExpr
/** `dim IN (SELECT dim FROM ...)` — subquery must select one dim
  * (sql/sql.go:1054-1064); lowered to a left-semi join. */
final case class DInSub(e: DExpr, sub: Query, negated: Boolean) extends DExpr
final case class DIsNull(e: DExpr, negated: Boolean) extends DExpr
/** Dimension function: CONCAT SPLIT SUBSTR REPLACEALL LEN ANY ARRAY DECODE
  * RAND + geo/ISP/redis-style lookups (sql/sql.go:76-123). */
final case class DFn(name: String, args: Seq[DExpr]) extends DExpr

// ---------------------------------------------------------------------------
// Query IR
// ---------------------------------------------------------------------------

final case class FieldSel(name: String, expr: MExpr)

sealed trait GroupCol { def name: String }
/** Plain dim reference in GROUP BY. */
final case class GroupDim(name: String) extends GroupCol
/** Derived dim: expression + alias (sql/sql.go:561-598). */
final case class GroupExpr(name: String, expr: DExpr) extends GroupCol

final case class OrderSel(name: String, desc: Boolean)

sealed trait TimePoint
/** Relative to "now": ASOF '-1h' (sql/duration.go grammar incl d/w). */
final case class TimeRel(offsetMillis: Long) extends TimePoint
/** Absolute RFC3339 instant, epoch millis UTC. */
final case class TimeAbs(epochMillis: Long) extends TimePoint

sealed trait From
final case class FromTable(name: String) extends From
final case class FromSub(q: Query) extends From
/** Dialect table function `SIMSEARCH('index', [v1, v2, ...], k, nProbe)`:
  * ANN top-k over a registered IVF index, as a queryable table of
  * (id, score). The outer WHERE becomes the search's PRE-filter — the
  * predicate composes into the partition-pruned index scan before
  * ranking, so the result is the k best MATCHING rows (filtered vector
  * search), not a post-filtered top-k.
  */
final case class FromSimSearch(index: String, vec: Seq[Float], k: Int,
                               nProbe: Int,
                               queryTable: Option[String] = None) extends From

final case class Query(
    fields: Seq[FieldSel],
    selectAll: Boolean,
    from: From,
    where: Option[DExpr] = None,
    asOf: Option[TimePoint] = None,
    until: Option[TimePoint] = None,
    groupBy: Seq[GroupCol] = Nil,
    groupByAll: Boolean = false,
    resolution: Option[FiniteDuration] = None,
    stride: Option[FiniteDuration] = None,
    crosstab: Seq[DExpr] = Nil,
    crosstabTotal: Boolean = false,
    having: Option[MExpr] = None,
    orderBy: Seq[OrderSel] = Nil,
    offset: Int = 0,
    limit: Option[Int] = None,
    forceFresh: Boolean = false,
    // caller-supplied CROSSTAB pivot values (`-- crosstab_values v1,v2`):
    // skips the distinct-collect job and bounds the pivot explicitly
    crosstabValues: Option[Seq[String]] = None)

object MExpr {
  /** Canonical string form — used to dedup identical aggregate subtrees when
    * compiling a SELECT list (two references to SUM(x) share one agg column),
    * analogous to the reference's expression-equality field remapping
    * (/root/reference/row_store.go:987-1015). */
  def canonical(e: MExpr): String = e match {
    case MField(n)         => s"f($n)"
    case MBare(n)          => s"b($n)"
    case MConst(v)         => s"c($v)"
    case MAgg(op, c)       => s"${op.name}(${canonical(c)})"
    case MWAvg(x, w)       => s"WAVG(${canonical(x)},${canonical(w)})"
    // p is NOT part of the identity: the sketch is quantile-independent,
    // which is what lets PERCENTILE(field, p2) reuse stored storage
    // (/root/reference/expr/percentile_optimized.go)
    case MPercentile(c, _, lo, hi, pr) =>
      s"PTILE(${canonical(c)},$lo,$hi,$pr)"
    case MPercentileOpt(c, p) => s"PTILEOPT(${canonical(c)},${canonical(p)})"
    case MIf(cond, c)      => s"IF(${DExpr.canonical(cond)},${canonical(c)})"
    case MBounded(c, lo, hi) => s"BOUNDED(${canonical(c)},$lo,$hi)"
    case MShift(c, off, sfx) => s"SHIFT(${canonical(c)},$off,$sfx)"
    case MArith(op, l, r)  => s"(${canonical(l)}$op${canonical(r)})"
    case MCond(op, l, r)   => s"(${canonical(l)} $op ${canonical(r)})"
    case MMath(fn, c)      => s"$fn(${canonical(c)})"
  }
}

object DExpr {
  def canonical(e: DExpr): String = e match {
    case DCol(n)        => s"d($n)"
    case DConst(v)      => s"k($v)"
    case DCmp(op, l, r) => s"(${canonical(l)}$op${canonical(r)})"
    case DAnd(l, r)     => s"(${canonical(l)} AND ${canonical(r)})"
    case DOr(l, r)      => s"(${canonical(l)} OR ${canonical(r)})"
    case DNot(c)        => s"NOT(${canonical(c)})"
    case DLike(c, p, n) => s"LIKE(${canonical(c)},$p,$n)"
    case DIn(c, vs, n)  => s"IN(${canonical(c)},${vs.mkString("|")},$n)"
    case DInSub(c, _, n) => s"INSUB(${canonical(c)},$n)"
    case DIsNull(c, n)  => s"ISNULL(${canonical(c)},$n)"
    case DFn(f, as)     => s"$f(${as.map(canonical).mkString(",")})"
  }
}
