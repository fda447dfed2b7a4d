package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.sqlx._

/** Lowers the measure/dimension expression IR to Spark [[Column]]s.
  *
  * A SELECT list compiles in two layers, mirroring how Catalyst evaluates an
  * Aggregate: per-row *value* expressions feed aggregate functions, and
  * *post-aggregation* arithmetic composes the aggregate results
  * (the reference's Update vs Get split, /root/reference/expr/expr.go:83-124).
  * Identical aggregate subtrees are deduped by canonical form so
  * `errors / requests` style derived fields share the underlying agg columns.
  */
object Builders {

  /** zenodb division rule (/root/reference/expr/calcs.go:24-31):
    * x/0 = 0 when x==0, else MaxFloat64.
    */
  def zdiv(num: Column, den: Column): Column =
    when(den === 0.0, when(num === 0.0, lit(0.0)).otherwise(lit(Double.MaxValue)))
      .otherwise(num / den)

  /** Conds produce 0/1 doubles; AND/OR test `> 0`
    * (/root/reference/expr/conds.go:3-90).
    */
  def zcond(op: String, l: Column, r: Column): Column = {
    val b = op match {
      case "<"   => l < r
      case "<="  => l <= r
      case "="   => l === r
      case "<>"  => l =!= r
      case ">="  => l >= r
      case ">"   => l > r
      case "AND" => (l > 0.0) && (r > 0.0)
      case "OR"  => (l > 0.0) || (r > 0.0)
      case other => throw new IllegalArgumentException(s"unknown cond $other")
    }
    when(b, lit(1.0)).otherwise(lit(0.0))
  }

  // -------------------------------------------------------------------------
  // Dimension expressions
  // -------------------------------------------------------------------------

  /** Lower a dim expression. `resolve` maps a dim name to its Column.
    * IN-subqueries must be rewritten by the planner before lowering.
    */
  def dim(e: DExpr, resolve: String => Column): Column = e match {
    case DCol(n)      => resolve(n)
    case DConst(null) => lit(null)
    case DConst(v)    => lit(v)
    case DCmp(op, l, r) =>
      val (lc, rc) = (dim(l, resolve), dim(r, resolve))
      op match {
        case "="         => lc === rc
        case "<>" | "!=" => lc =!= rc
        case "<"         => lc < rc
        case "<="        => lc <= rc
        case ">"         => lc > rc
        case ">="        => lc >= rc
        case other       => throw new IllegalArgumentException(s"cmp $other")
      }
    case DAnd(l, r) => dim(l, resolve) && dim(r, resolve)
    case DOr(l, r)  => dim(l, resolve) || dim(r, resolve)
    case DNot(c)    => !dim(c, resolve)
    // goexpr LIKE is a bare regex match, not SQL %-wildcards — the reference
    // test uses patterns like '172.56.' (sql/sql_test.go:69). Unanchored.
    case DLike(c, pattern, neg) =>
      val m = dim(c, resolve).rlike(pattern)
      if (neg) !m else m
    // Null-safe membership: the reference collects dim values (nil included)
    // into a set and tests membership (planner/subquery.go:54-72), so nil is
    // a first-class member — never a three-valued unknown. SQL's NULL-poisoned
    // IN would drop every row under NOT when the set holds a null; here the
    // predicate is always true/false so it composes under any boolean shape
    // identically to the semi/anti-join path.
    // Written as IsNotNull && In (|| IsNull) rather than coalesce so the
    // predicate is never NULL *and* still translates to parquet pushdown
    // filters (coalesce would block PushedFilters at the scan).
    case DIn(c, values, neg) =>
      val cc = dim(c, resolve)
      val nonNull = values.filter(_ != null)
      var m = cc.isNotNull && cc.isin(nonNull: _*)
      if (values.exists(_ == null)) m = m || cc.isNull
      if (neg) !m else m
    case DInSub(_, _, _) =>
      throw new IllegalStateException(
        "IN-subquery must be lowered by the planner (left-semi join)")
    case DIsNull(c, neg) =>
      if (neg) dim(c, resolve).isNotNull else dim(c, resolve).isNull
    case DFn(name, args) => dimFn(name, args.map(dim(_, resolve)), args)
  }

  /** Dimension functions (/root/reference/sql/sql.go:76-123 registry). */
  private def dimFn(name: String, cols: Seq[Column], raw: Seq[DExpr]): Column =
    name.toUpperCase match {
      case "CONCAT" => concat_ws(constStr(raw.head), cols.tail: _*)
      case "SPLIT" =>
        split(cols.head, java.util.regex.Pattern.quote(constStr(raw(1))))
          .getItem(constInt(raw(2)))
      case "SUBSTR"     => cols.head.substr(cols(1), cols(2))
      case "REPLACEALL" => regexp_replace(cols.head, constStr(raw(1)), constStr(raw(2)))
      case "LEN"        => length(cols.head)
      case "ANY"        => coalesce(cols: _*)
      case "ARRAY"      => array(cols: _*)
      case "DECODE" =>
        // DECODE(expr, v1, r1, v2, r2, ..., default) — Oracle style.
        val subject = cols.head
        val rest = cols.tail
        val default = if (rest.size % 2 == 1) rest.last else lit(null)
        val pairs = rest.dropRight(rest.size % 2).grouped(2).toSeq
        pairs.foldRight(default) { case (pair, acc) =>
          when(subject === pair(0), pair(1)).otherwise(acc)
        }
      case "RAND" => rand()
      // text/URL pipeline primitives surfaced into the dialect (beyond the
      // reference's function set — its users curate with external tools;
      // ours can derive curation dims inside a query): all map-only Column
      // compositions, so they group/filter like any built-in dim fn
      case "NORMTEXT" => graft.pipeline.TextAnalysis.normalizeText(cols.head)
      case "TOKCOUNT" => graft.pipeline.TextAnalysis.tokenCount(cols.head)
      case "SIMHASH" => graft.pipeline.Dedup.simHash(cols.head)
      case "FINGERPRINT" => graft.pipeline.TextAnalysis.fingerprint(cols.head)
      case "URLHOST" => graft.pipeline.UrlOps.urlHost(cols.head)
      case "URLDOMAIN" =>
        graft.pipeline.UrlOps.registeredDomain(
          graft.pipeline.UrlOps.urlHost(cols.head))
      case "URLNORM" => graft.pipeline.UrlOps.normalizeUrl(cols.head)
      case "URLDOMAINPSL" => // full Public Suffix List resolution
        graft.pipeline.UrlOps.registeredDomainPsl(
          graft.pipeline.UrlOps.urlHost(cols.head))
      case other =>
        val pr = dimFnProvidersRaw.get(other)
        if (pr != null) pr(cols, raw)
        else {
          val p = dimFnProviders.get(other)
          if (p != null) p(cols)
          else throw new IllegalArgumentException(
            s"dim function $other has no registered provider " +
              "(Builders.registerDimFnProvider) — geo/ISP/redis-style lookups " +
              "are pluggable, reference zenodb.go:256-276")
        }
    }

  /** Pluggable lookup functions (CITY/ISP/ASN/HGET/... —
    * /root/reference/sql/sql.go:81-106). The idiomatic Spark shape is a
    * broadcast map or a broadcast-joined dim table, never a per-row RPC:
    * {{{
    * val geo = spark.sparkContext.broadcast(ipToCity)
    * Builders.registerDimFnProvider("CITY",
    *   cols => udf((ip: String) => geo.value.get(ip).orNull).apply(cols.head))
    * }}}
    */
  private val dimFnProviders =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Column] => Column]()
  // raw-aware providers additionally see the parsed argument AST — needed by
  // functions whose first arg selects a compile-time structure (HGET's hash
  // name, LUA's script), mirroring how the reference resolves them at parse
  // time (sql.go:92-106)
  private val dimFnProvidersRaw = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[Column], Seq[DExpr]) => Column]()
  def registerDimFnProviderRaw(
      name: String, f: (Seq[Column], Seq[DExpr]) => Column): Unit = {
    dimFnProvidersRaw.put(name.toUpperCase, f)
    graft.sqlx.Parser.registerDimFunction(name)
  }
  def registerDimFnProvider(name: String, f: Seq[Column] => Column): Unit = {
    dimFnProviders.put(name.toUpperCase, f)
    graft.sqlx.Parser.registerDimFunction(name)
  }

  /** Invoke a registered provider directly — lets composed providers
    * (e.g. REGION_CITY = REGION + CITY) reuse their parts.
    */
  def dimFnColumn(name: String, cols: Seq[Column]): Column = {
    val p = dimFnProviders.get(name.toUpperCase)
    require(p != null, s"no dim function provider registered for $name")
    p(cols)
  }

  private def constStr(e: DExpr): String = e match {
    case DConst(s: String) => s
    case other =>
      throw new IllegalArgumentException(s"expected string const, got $other")
  }
  private def constInt(e: DExpr): Int = e match {
    case DConst(l: java.lang.Long)   => l.toInt
    case DConst(d: java.lang.Double) => d.toInt
    case other =>
      throw new IllegalArgumentException(s"expected int const, got $other")
  }

  // -------------------------------------------------------------------------
  // Measure expressions
  // -------------------------------------------------------------------------

  /** A time-shifted value: `alias` must carry `srcExpr`'s value from
    * `offsetMillis` earlier within the same group — the planner lowers this
    * with a self-join on the shifted time bucket (the SubMerge-shift of
    * /root/reference/expr/shift.go:62-72 re-expressed over windows).
    */
  final case class ShiftReq(alias: String, srcExpr: Column, offsetMillis: Long)

  /** How a stored accumulator column re-merges when buckets re-aggregate to
    * coarser groupings — the reference's `Expr.Merge`/`SubMerge` contract
    * (/root/reference/expr/expr.go:83-124) collapsed onto Spark built-ins:
    * SUM/COUNT/AVG-parts merge by sum, MIN by min, MAX by max.
    */
  sealed trait MergeOp
  object MergeOp {
    case object Sum extends MergeOp
    case object Min extends MergeOp
    case object Max extends MergeOp
    /** binary percentile-sketch columns merge via histogram addition */
    final case class Sketch(lo: Double, hi: Double, precision: Int) extends MergeOp
    /** NOT re-mergeable: the raw-query exact percentile is a final value, not
      * an accumulator — re-aggregating it to a coarser grouping is undefined.
      * Never reaches storage (stored percentiles are [[Sketch]]es); consumers
      * that re-merge (crosstab totals, offline merge) must fall back to a
      * source re-aggregation when they see it.
      */
    case object Opaque extends MergeOp
    def apply(op: MergeOp, c: Column): Column = op match {
      case Sum => sum(c)
      case Min => min(c)
      case Max => max(c)
      case Sketch(lo, hi, p) =>
        graft.functions.PercentileSketch.mergeAgg(c, lo, hi, p)
      case Opaque => throw new IllegalStateException(
        "exact-percentile accumulators are not re-mergeable")
    }
  }

  /** One accumulator column: alias, the aggregation that produces it from
    * raw rows, and how it re-merges from stored buckets.
    */
  final case class AggSpec(alias: String, agg: Column, merge: MergeOp)

  /** `fields`/`having` take an agg-alias resolver so the same compiled SELECT
    * list can be projected against differently-named agg columns — the plain
    * path resolves `__aN -> col("__aN")`, the CROSSTAB path resolves
    * `__aN -> col("<pivotval>___aN")` per pivot value, and the stored-table
    * path resolves against re-merged accumulator columns.
    */
  final case class Compiled(
      aggSpecs: Seq[AggSpec],            // accumulator columns (aliased __aN)
      shifts: Seq[ShiftReq],             // post-agg time-shift requirements
      fields: Seq[(String, (String => Column) => Column)],
      having: Option[(String => Column) => Column],
      keyed: Map[String, (String, MergeOp)]) { // canonical key -> (alias, merge)
    def aggs: Seq[Column] = aggSpecs.map(_.agg)
    def fieldCols: Seq[(String, Column)] =
      fields.map { case (n, mk) => n -> mk(col _).as(n) }
    def havingCol: Option[Column] = having.map(_(col _))
  }

  /** A materialized table's definition, for compiling queries that READ the
    * stored accumulators instead of raw rows: `tableFields` are the defining
    * field expressions in declaration order. Re-walking them regenerates the
    * same canonical-key → accumulator-alias assignment the table was stored
    * with, so a query aggregate that structurally matches a stored aggregate
    * resolves to a *merge* of the stored column — the reference's
    * SubMerge-based field compatibility (planner/local.go:85-97).
    */
  final case class StoredDef(tableFields: Seq[FieldSel])

  /** Compile a SELECT list (+ optional HAVING) into aggregate columns and
    * post-agg projections. `resolveVal` maps measure names to per-row value
    * columns; `resolveDim` maps dim names for IF conditions. With `stored`,
    * aggregates must match a stored accumulator (else the zenodb "No column
    * found" error) and compile to merge-reads.
    */
  def compile(
      fields: Seq[FieldSel],
      having: Option[MExpr],
      resolveVal: String => Column,
      resolveDim: String => Column,
      stored: Option[StoredDef] = None,
      forStorage: Boolean = false): Compiled = {

    // canonical key -> (alias, accumulator spec)
    val aggs = scala.collection.mutable.LinkedHashMap.empty[String, AggSpec]
    // canonical key -> ShiftReq
    val shifts = scala.collection.mutable.LinkedHashMap.empty[String, ShiftReq]

    type PostB = (String => Column) => Column

    // gating condition: the Column to gate with + its resolver-independent key
    case class GateCond(col: Column, key: String) {
      def &&(o: GateCond): GateCond = GateCond(col && o.col, s"$key&${o.key}")
    }

    // Stored-read mode: shadow-walk the table's defining fields to rebuild
    // the canonical-key -> (stored alias, merge op) map, then resolve query
    // aggregates against it. `shadow` is None when compiling raw sources.
    val shadow: Option[Map[String, (String, MergeOp)]] = stored.map { sd =>
      // regenerate the STORAGE-side aliases/merges (forStorage=true)
      compile(sd.tableFields, None, resolveVal, resolveDim, None,
        forStorage = true).keyed
    }

    // Accumulator names are content-addressed (stable hash of the canonical
    // key), NOT positional: a schema that adds/reorders fields keeps every
    // existing stored column meaning what it meant — the reference gets the
    // same safety from per-file field headers + name/expression remapping
    // (row_store.go:919-953).
    def rawAggRef(key: String, merge: MergeOp, mk: => Column): String =
      aggs.getOrElseUpdate(key, {
        val a = "__a" + stableHash(key)
        AggSpec(a, mk.as(a), merge)
      }).alias

    /** Register the aggregate for `canon` under condition `cond`. Raw mode
      * builds the accumulation column (`mk`). Stored mode resolves against
      * the shadow map: exact key match (defining-expr read, including its IF
      * conditions) → plain merge of the stored column; condition-free match
      * with a query-level IF on top → gated merge; no match → the
      * reference's "No column found" rejection (README.md:239-247).
      */
    def ref(canon: String, cond: Option[GateCond], merge: MergeOp,
            mk: => Column): String = {
      val keyFull = s"$canon|${condKey(cond)}"
      shadow match {
        case None => rawAggRef(keyFull, merge, mk)
        case Some(sh) =>
          sh.get(keyFull) match {
            case Some((sa, m)) => rawAggRef(keyFull, m, MergeOp(m, col(sa)))
            case None => sh.get(s"$canon|") match {
              case Some((sa, m)) => rawAggRef(keyFull, m,
                MergeOp(m, cond.map(c => when(c.col, col(sa))).getOrElse(col(sa))))
              case None => throw new IllegalArgumentException(
                s"No column found for $canon (not computable from this " +
                  "table's stored fields)")
            }
          }
      }
    }

    // Per-row value expression (feeds an aggregate function).
    def value(e: MExpr, cond: Option[GateCond]): Column = {
      def gate(c: Column): Column = cond match {
        case Some(p) => when(p.col, c)
        case None    => c
      }
      e match {
        case MField(n)        => gate(resolveVal(n))
        case MConst(v)        => gate(lit(v))
        case MBounded(c, lo, hi) =>
          val v = value(c, cond)
          when(v.between(lo, hi), v) // outside range => unset (NULL), not clamped
        case MArith(op, l, r) =>
          val (lc, rc) = (value(l, cond), value(r, cond))
          op match {
            case "+" => lc + rc
            case "-" => lc - rc
            case "*" => lc * rc
            case "/" => zdiv(lc, rc)
          }
        case MMath(fn, c) => mathFn(fn, value(c, cond))
        case other =>
          throw new IllegalArgumentException(
            s"not a per-row value expression: $other (aggregates can wrap " +
              "only fields, constants, BOUNDED and arithmetic — " +
              "reference expr/aggregate.go:47-56)")
      }
    }

    // Condition identity comes from the IR (DExpr canonical), NOT from the
    // resolved Column: at read time a non-grouped dim (e.g. the IF's dim_md)
    // resolves to NULL, but the stored accumulator already encodes the
    // condition — the key must still match the storage-side key.
    def condKey(cond: Option[GateCond]): String =
      cond.map(_.key).getOrElse("")

    // Post-aggregation expression builder; agg nodes register aggregates and
    // defer alias lookup to the resolver (plain vs per-pivot-value columns).
    def post(e: MExpr, cond: Option[GateCond]): PostB = e match {
      case MConst(v) => _ => lit(v)
      case MArith(op, l, r) =>
        val (lb, rb) = (post(l, cond), post(r, cond))
        res => op match {
          case "+" => lb(res) + rb(res)
          case "-" => lb(res) - rb(res)
          case "*" => lb(res) * rb(res)
          case "/" => zdiv(lb(res), rb(res))
        }
      case MCond(op, l, r) =>
        val (lb, rb) = (post(l, cond), post(r, cond))
        res => zcond(op, lb(res), rb(res))
      case MMath(fn, c) =>
        val cb = post(c, cond)
        res => mathFn(fn, cb(res))
      case MBounded(c, lo, hi) =>
        // BOUNDED above an aggregate: out-of-range results become unset
        val cb = post(c, cond)
        res => { val v = cb(res); when(v.between(lo, hi), v) }
      case MIf(c, inner) =>
        val p = GateCond(dim(c, resolveDim), DExpr.canonical(c))
        post(inner, cond.map(_ && p).orElse(Some(p)))
      case MShift(inner, off, _) =>
        val key = s"${MExpr.canonical(inner)}|${condKey(cond)}|$off"
        val req = shifts.getOrElseUpdate(key, {
          ShiftReq(s"__s${shifts.size}", post(inner, cond)(col _), off)
        })
        _ => col(req.alias)
      case MAgg(AggOp.Avg, child) =>
        // AVG stores a (count, total) pair so partials merge correctly and
        // coarser re-aggregation stays weighted (/root/reference/expr/avg.go)
        val canon = MExpr.canonical(e)
        val cnt = ref(canon + ":cnt", cond, MergeOp.Sum,
          count(value(child, cond)).cast("double"))
        val tot = ref(canon + ":tot", cond, MergeOp.Sum, sum(value(child, cond)))
        res => when(res(cnt).isNull || res(cnt) === 0.0, lit(null))
          .otherwise(res(tot) / res(cnt))
      case MAgg(op, child) =>
        val alias = ref(MExpr.canonical(e), cond,
          if (op == AggOp.Min) MergeOp.Min
          else if (op == AggOp.Max) MergeOp.Max
          else MergeOp.Sum,
          op match {
            case AggOp.Sum   => sum(value(child, cond))
            case AggOp.Min   => min(value(child, cond))
            case AggOp.Max   => max(value(child, cond))
            case AggOp.Count => count(value(child, cond)).cast("double")
            case AggOp.Avg   => throw new IllegalStateException("unreachable")
          })
        res => res(alias)
      case MWAvg(x, w) =>
        // count += w; total += x*w; Get = total/count, 0 when count==0
        // (/root/reference/expr/avg.go:19-21,52-63,109-113)
        val canon = MExpr.canonical(e)
        val tot = ref(canon + ":tot", cond, MergeOp.Sum,
          sum(value(x, cond) * value(w, cond)))
        val cnt = ref(canon + ":cnt", cond, MergeOp.Sum, sum(value(w, cond)))
        res => when(res(cnt) === 0.0, lit(0.0)).otherwise(res(tot) / res(cnt))
      case MPercentile(child, p, lo, hi, precision) =>
        // Out-of-range inputs are DISCARDED (BOUNDED semantics,
        // /root/reference/expr/percentile.go:16-19); p is a constant percent.
        val pv = constOf(p) / 100.0
        lazy val v = {
          val v0 = value(child, cond)
          when(v0.between(lo, hi), v0)
        }
        if (forStorage || shadow.isDefined) {
          // mergeable HDR-style sketch: storable, re-mergeable, and readable
          // at ANY quantile (PERCENTILE(field, p2) reuse)
          val alias = ref(MExpr.canonical(e), cond,
            MergeOp.Sketch(lo, hi, precision),
            graft.functions.PercentileSketch.sketchAgg(v, lo, hi, precision))
          res => graft.functions.PercentileSketch.valueAt(
            res(alias), pv, lo, hi, precision)
        } else {
          // raw one-shot query: exact interpolated percentile
          val alias = ref(s"${MExpr.canonical(e)}:p$pv", cond, MergeOp.Opaque,
            percentile(v, lit(pv)).cast("double"))
          res => res(alias)
        }
      case MPercentileOpt(child, p) =>
        throw new IllegalArgumentException(
          s"PERCENTILE(${MExpr.canonical(child)}, ${MExpr.canonical(p)}) " +
            "reuse requires a stored percentile field (the planner rewrites " +
            "it on materialized tables)")
      case MField(n) =>
        // Bare field at post-agg level: a reference to a SELECT alias
        // (HAVING over computed fields). The planner keeps field columns in
        // scope when evaluating HAVING.
        _ => col(n)
      case MBare(n) =>
        throw new IllegalStateException(
          s"unresolved bare column $n — the planner must default it to an " +
            "aggregate before compilation")
    }

    val fieldBs = fields.map { fs => fs.name -> post(fs.expr, None) }
    val havingB = having.map(h => post(h, None))

    Compiled(
      aggs.values.toSeq,
      shifts.values.toSeq,
      fieldBs,
      havingB,
      aggs.map { case (k, spec) => k -> (spec.alias, spec.merge) }.toMap)
  }

  private def mathFn(fn: String, c: Column): Column = fn.toUpperCase match {
    case "LN"    => log(c)
    case "LOG2"  => log2(c)
    case "LOG10" => log10(c)
    case other   => throw new IllegalArgumentException(s"math fn $other")
  }

  private def stableHash(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString

  private def constOf(e: MExpr): Double = e match {
    case MConst(v) => v
    case other =>
      throw new IllegalArgumentException(
        s"expected constant, got $other (reference percentile.go:91-100)")
  }
}
