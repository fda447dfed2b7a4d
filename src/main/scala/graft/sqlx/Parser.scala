package graft.sqlx

import scala.collection.mutable.ArrayBuffer

/** Hand-rolled lexer + recursive-descent parser for the zenodb SQL dialect.
  *
  * Surface per the reference's golden parser test
  * (/root/reference/sql/sql_test.go:35-130): ASOF/UNTIL, period()/stride() in
  * GROUP BY, GROUP BY * and _, CROSSTAB/CROSSTABT, IF/BOUNDED/PERCENTILE
  * (2- and 5-arg)/SHIFT/CROSSHIFT/WAVG, bare-column ⇒ SUM defaulting,
  * `_points`/`_`/`_time`, HAVING, `LIMIT offset, count`, `-- force_fresh`,
  * Go-style durations with d/w units, IN lists and IN subqueries, dimension
  * functions with the P-prefix pushdown marker, and macro aliases.
  *
  * Identifiers are case-insensitive and normalized to lower case (the
  * reference lowercases its canonical field list).
  */
object Parser {

  // -- function registry (RegisterAlias / RegisterUnaryDIMFunction parity,
  //    /root/reference/sql/sql.go:125-139) --------------------------------
  private val aliasTemplates = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val customDimFns = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def registerAlias(name: String, template: String): Unit =
    aliasTemplates.put(name.toUpperCase, template)
  def registerDimFunction(name: String): Unit =
    customDimFns.add(name.toUpperCase)

  /** Load a `NAME = template` properties block — the reference's AliasesFile
    * (/root/reference/zenodb.go:66-68,351-373, quickstart_aliases.props).
    */
  def registerAliasesProps(text: String): Unit =
    text.split("\n").map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith("!"))
      .foreach { l =>
        val i = l.indexOf('=')
        if (i > 0) registerAlias(l.substring(0, i).trim, l.substring(i + 1).trim)
      }

  private val aggFns = Set("SUM", "MIN", "MAX", "COUNT", "AVG")
  private val measureFns = aggFns ++ Set("WAVG", "IF", "BOUNDED", "PERCENTILE",
    "SHIFT", "CROSSHIFT", "LN", "LOG2", "LOG10")
  private val coreDimFns = Set("CONCAT", "SPLIT", "SUBSTR", "REPLACEALL", "LEN",
    "ANY", "ARRAY", "DECODE", "RAND", "CITY", "REGION", "REGION_CITY",
    "COUNTRY_CODE", "ISP", "ORG", "ASN", "ASNAME", "HGET", "SISMEMBER", "LUA")

  // -- lexer ---------------------------------------------------------------

  sealed trait Tok
  final case class TIdent(s: String) extends Tok   // lowercased
  final case class TNum(v: Double) extends Tok
  final case class TStr(s: String) extends Tok
  final case class TPunct(s: String) extends Tok
  case object TEnd extends Tok

  final class LexResult(val toks: Vector[Tok], val forceFresh: Boolean,
                        val crosstabValues: Option[Seq[String]])

  def lex(input: String): LexResult = {
    val toks = ArrayBuffer.empty[Tok]
    var forceFresh = false
    var crosstabValues: Option[Seq[String]] = None
    // comment directives (≅ the reference's `-- force_fresh`, sql.go:279-283)
    def directive(comment: String): Unit = {
      if (comment.contains("force_fresh")) forceFresh = true
      val key = "crosstab_values"
      val k = comment.indexOf(key)
      if (k >= 0) {
        val rest = comment.substring(k + key.length)
          .dropWhile(ch => ch == ':' || ch == '=' || ch.isWhitespace)
        crosstabValues = Some(rest.split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq)
      }
    }
    var i = 0
    val n = input.length
    def peek(k: Int = 0): Char = if (i + k < n) input.charAt(i + k) else '\u0000'
    while (i < n) {
      val c = input.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && peek(1) == '-') { // -- comment
        val e = input.indexOf('\n', i); val end = if (e < 0) n else e
        directive(input.substring(i, end))
        i = end
      } else if (c == '/' && peek(1) == '/') {
        val e = input.indexOf('\n', i); val end = if (e < 0) n else e
        directive(input.substring(i, end))
        i = end
      } else if (c == '/' && peek(1) == '*') {
        val e = input.indexOf("*/", i); val end = if (e < 0) n else e + 2
        directive(input.substring(i, end))
        i = end
      } else if (c == '\'') {
        // both SQL escape styles, like the reference's MySQL-dialect
        // parser: backslash (`'it\'s'`) and doubled quote (`'it''s'`)
        val sb = new StringBuilder; i += 1
        var closed = false
        while (i < n && !closed) {
          val ch = input.charAt(i)
          if (ch == '\\' && i + 1 < n) { sb.append(input.charAt(i + 1)); i += 2 }
          else if (ch == '\'') {
            if (peek(1) == '\'') { sb.append('\''); i += 2 }
            else { closed = true; i += 1 }
          }
          else { sb.append(ch); i += 1 }
        }
        // the old lexer treated end-of-input as an implicit close — a
        // truncated query then parsed as a DIFFERENT valid query instead
        // of failing loud
        require(closed, s"unterminated string literal: '${sb.toString.take(40)}")
        toks += TStr(sb.toString)
      } else if (c == '`') {
        val e = input.indexOf('`', i + 1)
        require(e > 0, s"unterminated backtick at $i")
        toks += TIdent(input.substring(i + 1, e).toLowerCase)
        i = e + 1
      } else if (c.isDigit || (c == '.' && peek(1).isDigit)) {
        val start = i
        while (i < n && (input.charAt(i).isDigit || input.charAt(i) == '.')) i += 1
        // scientific notation (1.5e-3, 2E8): an e/E followed by an
        // optionally-signed digit run stays ONE number token — without
        // this the mantissa lexed as a duration-style ident and the
        // parser refused the literal
        val isExp = i < n &&
          (input.charAt(i) == 'e' || input.charAt(i) == 'E') && {
            val j = if (peek(1) == '+' || peek(1) == '-') i + 2 else i + 1
            j < n && input.charAt(j).isDigit
          }
        if (isExp) {
          i += 1
          if (i < n && (input.charAt(i) == '+' || input.charAt(i) == '-')) i += 1
          while (i < n && input.charAt(i).isDigit) i += 1
          toks += TNum(input.substring(start, i).toDouble)
        // number followed directly by a duration unit? lex as ident (5s, 1d)
        } else if (i < n && input.charAt(i).isLetter) {
          while (i < n && (input.charAt(i).isLetterOrDigit)) i += 1
          toks += TIdent(input.substring(start, i).toLowerCase)
        } else toks += TNum(input.substring(start, i).toDouble)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (input.charAt(i).isLetterOrDigit || input.charAt(i) == '_')) i += 1
        toks += TIdent(input.substring(start, i).toLowerCase)
      } else {
        val two = if (i + 1 < n) input.substring(i, i + 2) else ""
        if (two == "<=" || two == ">=" || two == "<>" || two == "!=") {
          toks += TPunct(two); i += 2
        } else {
          toks += TPunct(c.toString); i += 1
        }
      }
    }
    toks += TEnd
    new LexResult(toks.toVector, forceFresh, crosstabValues)
  }

  // -- parser ---------------------------------------------------------------

  /** Max expression/subquery nesting depth accepted from a query string —
    * ~6 stack frames per level keeps the cap far below any JVM stack limit
    * while allowing queries orders of magnitude deeper than real ones.
    */
  val MaxExprDepth: Int = 200

  // thread-shared so ALIAS macro expansion — which re-parses through a
  // fresh P — inherits the caller's depth: a self- or mutually-recursive
  // alias (F = F(%v)) must trip the cap, not restart it from zero
  private val depthTL = new ThreadLocal[Integer] {
    override def initialValue: Integer = 0
  }

  def parse(sql: String): Query = new P(lex(sql)).parseQuery(top = true)

  private final class P(lx: LexResult) {
    private val toks = lx.toks
    private var pos = 0

    private def cur: Tok = toks(pos)
    private def advance(): Tok = { val t = toks(pos); pos += 1; t }
    private def isIdent(s: String): Boolean = cur match {
      case TIdent(x) => x == s.toLowerCase
      case _         => false
    }
    private def eatIdent(s: String): Boolean =
      if (isIdent(s)) { pos += 1; true } else false
    private def expectIdent(s: String): Unit =
      require(eatIdent(s), s"expected $s, got $cur")
    private def isPunct(s: String): Boolean = cur match {
      case TPunct(x) => x == s
      case _         => false
    }
    private def eatPunct(s: String): Boolean =
      if (isPunct(s)) { pos += 1; true } else false
    private def expectPunct(s: String): Unit =
      require(eatPunct(s), s"expected '$s', got $cur")
    private def ident(): String = advance() match {
      case TIdent(s) => s
      case other     => throw new IllegalArgumentException(s"expected identifier, got $other")
    }

    // descend: FROM-(subquery) and IN-(subquery) recurse through here too —
    // a nested-subquery bomb must hit the depth cap, not the JVM stack
    def parseQuery(top: Boolean): Query = descend {
      expectIdent("select")
      var selectAll = false
      val fields = ArrayBuffer.empty[FieldSel]
      var first = true
      while (first || eatPunct(",")) {
        first = false
        if (eatPunct("*")) selectAll = true
        else fields ++= parseSelectItem()
      }
      expectIdent("from")
      val from: From =
        if (eatPunct("(")) { val q = parseQuery(top = false); expectPunct(")"); FromSub(q) }
        else if (isIdent("simsearch") && toks(pos + 1) == TPunct("(")) {
          // SIMSEARCH('index', [v1, v2, ...], k, nProbe) — the retrieval
          // table function; the index name is a string literal so
          // registered names can carry any characters. Batch mode takes a
          // TABLE of query vectors in place of the literal:
          // SIMSEARCH('index', TABLE queries, k, nProbe) — `queries` is a
          // catalog table carrying the index's id and vector columns, and
          // the result adds (qid, rank) to each (id, score) hit.
          pos += 1; expectPunct("(")
          val name = str()
          expectPunct(",")
          val (vec, queryTable) =
            if (isIdent("table")) { pos += 1; (Seq.empty[Float], Some(ident())) }
            else {
              expectPunct("[")
              val v = ArrayBuffer.empty[Float]
              if (!isPunct("]")) {
                var v1 = true
                while (v1 || eatPunct(",")) { v1 = false; v += num().toFloat }
              }
              expectPunct("]")
              require(v.nonEmpty, "SIMSEARCH needs a non-empty query vector")
              (v.toSeq, None)
            }
          expectPunct(",")
          val k = num().toInt
          expectPunct(",")
          val nProbe = num().toInt
          expectPunct(")")
          require(k > 0 && nProbe > 0, "SIMSEARCH k and nProbe must be > 0")
          FromSimSearch(name, vec, k, nProbe, queryTable)
        }
        else FromTable(ident())

      var asOf: Option[TimePoint] = None
      var until: Option[TimePoint] = None
      if (eatIdent("asof")) {
        asOf = Some(parseTimePoint())
        if (eatIdent("until")) until = Some(parseTimePoint())
      } else if (eatIdent("until")) until = Some(parseTimePoint())

      var where: Option[DExpr] = None
      if (eatIdent("where")) where = Some(parseDOr())

      var groupByAll = false
      var sawGroupBy = false
      val groupBy = ArrayBuffer.empty[GroupCol]
      var resolution: Option[scala.concurrent.duration.FiniteDuration] = None
      var stride: Option[scala.concurrent.duration.FiniteDuration] = None
      val crosstab = ArrayBuffer.empty[DExpr]
      var crosstabTotal = false
      if (eatIdent("group")) {
        sawGroupBy = true
        expectIdent("by")
        var g1 = true
        while (g1 || eatPunct(",")) {
          g1 = false
          if (eatPunct("*")) groupByAll = true
          else if (isIdent("_")) { pos += 1 } // GROUP BY _ => no dims
          else if (isIdent("period")) {
            pos += 1; expectPunct("(")
            resolution = Some(parseDurationArg())
            expectPunct(")")
          } else if (isIdent("stride")) {
            pos += 1; expectPunct("(")
            stride = Some(parseDurationArg())
            expectPunct(")")
          } else if (isIdent("crosstab") || isIdent("crosstabt")) {
            require(crosstab.isEmpty, "only one CROSSTAB per query")
            crosstabTotal = isIdent("crosstabt")
            pos += 1; expectPunct("(")
            var c1 = true
            while (c1 || eatPunct(",")) { c1 = false; crosstab += parseDOr() }
            expectPunct(")")
          } else {
            val e = parseDOr()
            if (eatIdent("as")) groupBy += GroupExpr(ident(), e)
            else e match {
              case DCol(nm) => groupBy += GroupDim(nm)
              case other =>
                throw new IllegalArgumentException(s"GROUP BY expression needs AS: $other")
            }
          }
        }
      }

      // no GROUP BY clause at all defaults to grouping by every dim
      // (reference sql.go:601-602); `GROUP BY _` / a bare period() is an
      // EXPLICIT choice of time-only grouping and stays as written
      if (!sawGroupBy) groupByAll = true

      var having: Option[MExpr] = None
      if (eatIdent("having")) having = Some(parseMOr(valueCtx = false))

      val orderBy = ArrayBuffer.empty[OrderSel]
      if (eatIdent("order")) {
        expectIdent("by")
        var o1 = true
        while (o1 || eatPunct(",")) {
          o1 = false
          val nm = ident()
          val desc = if (eatIdent("desc")) true else { eatIdent("asc"); false }
          orderBy += OrderSel(nm, desc)
        }
      }

      var offset = 0
      var limit: Option[Int] = None
      if (eatIdent("limit")) {
        val a = num().toInt
        if (eatPunct(",")) { offset = a; limit = Some(num().toInt) }
        else limit = Some(a)
        // reject at parse with the values named, instead of whatever
        // Spark's limit/offset operators throw mid-plan
        require(offset >= 0 && limit.forall(_ >= 0),
          s"LIMIT/OFFSET must be non-negative (got " +
            s"limit=${limit.getOrElse(-1)}, offset=$offset)")
      }
      if (top) require(cur == TEnd, s"trailing tokens at $cur")

      Query(fields.toSeq, selectAll, from, where, asOf, until, groupBy.toSeq,
        groupByAll, resolution, stride, crosstab.toSeq, crosstabTotal, having,
        orderBy.toSeq, offset, limit, lx.forceFresh, lx.crosstabValues)
    }

    // descend: a '- - - … 1' chain recurses once per sign token — without
    // the guard it is the same hostile-input stack bomb as nested parens
    private def num(): Double = descend {
      advance() match {
        case TNum(v) => v
        case TPunct("-") => -num()
        case other   => throw new IllegalArgumentException(s"expected number, got $other")
      }
    }

    private def str(): String = advance() match {
      case TStr(s) => s
      case other   => throw new IllegalArgumentException(s"expected string, got $other")
    }

    private def parseDurationArg(): scala.concurrent.duration.FiniteDuration = {
      import scala.concurrent.duration._
      val ms = cur match {
        case TStr(s)   => pos += 1; Durations.parseMillis(s)
        case TIdent(s) => pos += 1; Durations.parseMillis(s) // bare 5s lexes as ident
        case TNum(_)   => Math.round(num())                  // bare millis
        case other => throw new IllegalArgumentException(s"expected duration, got $other")
      }
      // period(0s)/stride(0s) would reach the planner as a zero bucket
      // width and surface as a divide-by-zero deep inside Spark — refuse
      // here with the argument named
      require(ms != 0, "period/stride duration must be non-zero")
      Math.abs(ms).millis
    }

    private def parseTimePoint(): TimePoint = {
      val s = str()
      Durations.tryParseMillis(s) match {
        case Some(ms) => TimeRel(ms)
        case None     => TimeAbs(parseInstantMillis(s))
      }
    }

    // -- SELECT items --------------------------------------------------------

    private def parseSelectItem(): Seq[FieldSel] = {
      // CROSSHIFT expands into multiple fields (sql/sql.go:363-422)
      if (isIdent("crosshift")) return parseCrosshift()
      val e = parseMOr(valueCtx = false)
      val name: String =
        if (eatIdent("as")) ident()
        else e match {
          case MBare(nm)  => nm // bare column, aggregate defaulting at plan time
          case MField(nm) => nm
          case MAgg(AggOp.Sum, MField("_point")) => "_points"
          case _ => throw new IllegalArgumentException(
            s"SELECT expression needs AS: ${MExpr.canonical(e)}")
        }
      Seq(FieldSel(name, e))
    }

    private def parseCrosshift(): Seq[FieldSel] = {
      pos += 1; expectPunct("(")
      val inner = parseMOr(valueCtx = false)
      expectPunct(",")
      val cutoffMs = Durations.parseMillis(str())
      expectPunct(",")
      val intervalMs = Math.abs(Durations.parseMillis(str()))
      expectPunct(")")
      require(cutoffMs != 0 && intervalMs != 0, "CROSSHIFT zero cutoff or interval")
      val as: String =
        if (eatIdent("as")) ident()
        else inner match {
          case MBare(nm)  => nm
          case MField(nm) => nm
          case _ => throw new IllegalArgumentException("CROSSHIFT expression needs AS")
        }
      val limit = Math.abs(cutoffMs)
      val out = ArrayBuffer.empty[FieldSel]
      var off = 0L
      while (off < limit) {
        val nm = if (off == 0) as else s"${as}_${Durations.format(off)}"
        val e = if (off == 0) inner
                else MShift(inner, off, Durations.format(off))
        out += FieldSel(nm, e)
        off += intervalMs
      }
      out.toSeq
    }

    // -- measure expressions -------------------------------------------------
    // precedence: OR < AND < cond < additive < multiplicative < primary

    // recursion guard: this parser serves untrusted input (HTTP /run, RPC
    // QUERY), and a recursive-descent parser fed 20k nested parens dies
    // with StackOverflowError — an Error, which escapes the servers'
    // `catch Exception` and kills the handler thread without a response.
    // Cap the depth with a loud, catchable error instead.
    private def descend[T](f: => T): T = {
      val d = Parser.depthTL.get + 1
      if (d > Parser.MaxExprDepth)
        throw new IllegalArgumentException(
          s"expression nesting exceeds ${Parser.MaxExprDepth} levels")
      Parser.depthTL.set(d)
      try f finally Parser.depthTL.set(d - 1)
    }

    private def parseMOr(valueCtx: Boolean): MExpr = descend {
      var l = parseMAnd(valueCtx)
      while (isIdent("or")) { pos += 1; l = MCond("OR", l, parseMAnd(valueCtx)) }
      l
    }
    private def parseMAnd(valueCtx: Boolean): MExpr = {
      var l = parseMCond(valueCtx)
      while (isIdent("and")) { pos += 1; l = MCond("AND", l, parseMCond(valueCtx)) }
      l
    }
    private def parseMCond(valueCtx: Boolean): MExpr = {
      var l = parseMAdd(valueCtx)
      while (isPunct("<") || isPunct("<=") || isPunct("=") || isPunct("<>") ||
             isPunct(">=") || isPunct(">") || isPunct("!=")) {
        val op0 = advance().asInstanceOf[TPunct].s
        val op = if (op0 == "!=") "<>" else op0
        l = MCond(op, l, parseMAdd(valueCtx))
      }
      l
    }
    private def parseMAdd(valueCtx: Boolean): MExpr = {
      var l = parseMMul(valueCtx)
      while (isPunct("+") || isPunct("-")) {
        val op = advance().asInstanceOf[TPunct].s
        l = MArith(op, l, parseMMul(valueCtx))
      }
      l
    }
    private def parseMMul(valueCtx: Boolean): MExpr = {
      var l = parseMPrimary(valueCtx)
      while (isPunct("*") || isPunct("/")) {
        val op = advance().asInstanceOf[TPunct].s
        l = MArith(op, l, parseMPrimary(valueCtx))
      }
      l
    }

    private def parseMPrimary(valueCtx: Boolean): MExpr = cur match {
      case TNum(_) => MConst(num())
      case TPunct("-") => pos += 1; MConst(-num())
      case TPunct("(") =>
        pos += 1; val e = parseMOr(valueCtx); expectPunct(")"); e
      case TIdent(nm) if toks(pos + 1) == TPunct("(") && measureFns.contains(nm.toUpperCase) =>
        pos += 2 // name + (
        val e = parseMeasureFn(nm.toUpperCase, valueCtx)
        expectPunct(")")
        e
      case TIdent("_points") => pos += 1
        if (valueCtx) MField("_point") else MAgg(AggOp.Sum, MField("_point"))
      case TIdent("_") => pos += 1
        // `_` = "any point present" => _points > 0 (sql/sql.go:720-737)
        MCond(">", MAgg(AggOp.Sum, MField("_point")), MConst(0))
      case TIdent(nm) => pos += 1
        if (valueCtx) MField(nm) else MBare(nm)
      case other => throw new IllegalArgumentException(s"unexpected token $other")
    }

    private def parseMeasureFn(fn: String, valueCtx: Boolean): MExpr = fn match {
      case "SUM" | "MIN" | "MAX" | "COUNT" | "AVG" =>
        val child = parseMOr(valueCtx = true)
        val op = fn match {
          case "SUM" => AggOp.Sum; case "MIN" => AggOp.Min
          case "MAX" => AggOp.Max; case "COUNT" => AggOp.Count
          case "AVG" => AggOp.Avg
        }
        MAgg(op, child)
      case "WAVG" =>
        val x = parseMOr(valueCtx = true); expectPunct(",")
        val w = parseMOr(valueCtx = true)
        MWAvg(x, w)
      case "IF" =>
        val cond = parseDOr(); expectPunct(",")
        val inner = parseMOr(valueCtx)
        MIf(cond, inner)
      case "BOUNDED" =>
        val c = parseMOr(valueCtx = true); expectPunct(",")
        val lo = num(); expectPunct(",")
        val hi = num()
        MBounded(c, lo, hi)
      case "PERCENTILE" =>
        val c = parseMOr(valueCtx = true); expectPunct(",")
        val p = parseMOr(valueCtx = true)
        if (eatPunct(",")) {
          val lo = num(); expectPunct(",")
          val hi = num(); expectPunct(",")
          val precision = num().toInt
          MPercentile(c, p, lo, hi, precision)
        } else MPercentileOpt(c, p)
      case "SHIFT" =>
        val inner = parseMOr(valueCtx = false); expectPunct(",")
        // the dialect keeps the duration's SIGN (the reference's canonical
        // example is SHIFT(SUM(b), '-1h'), sql.go:35, and seq.go:244
        // consumes it as shiftBack = -1 * Shift()): a NEGATIVE duration
        // compares against the PAST, a positive one against the future.
        // MShift stores the STORE-SIDE re-key offset — the negation — so
        // the idiomatic '-1h' (and every stored golden) keeps the exact
        // AST it always had: +3600000 = show bucket t-1h's value at t.
        // Earlier rounds abs()'d here, silently collapsing '1h' onto
        // look-back; r19 restores the reference's forward shift.
        val userMs = Durations.parseMillis(str())
        MShift(inner, -userMs, Durations.format(Math.abs(userMs)))
      case "LN" | "LOG2" | "LOG10" =>
        MMath(fn, parseMOr(valueCtx))
      case other => throw new IllegalArgumentException(s"measure fn $other")
    }

    // -- dimension expressions ------------------------------------------------

    private def parseDOr(): DExpr = descend {
      var l = parseDAnd()
      while (isIdent("or")) { pos += 1; l = DOr(l, parseDAnd()) }
      l
    }
    private def parseDAnd(): DExpr = {
      var l = parseDNot()
      while (isIdent("and")) { pos += 1; l = DAnd(l, parseDNot()) }
      l
    }
    private def parseDNot(): DExpr = descend {
      if (eatIdent("not")) DNot(parseDNot()) else parseDPredicate()
    }

    private def parseDPredicate(): DExpr = {
      val l = parseDPrimary()
      if (isPunct("=") || isPunct("<>") || isPunct("!=") || isPunct("<") ||
          isPunct("<=") || isPunct(">") || isPunct(">=")) {
        val op0 = advance().asInstanceOf[TPunct].s
        val op = if (op0 == "!=") "<>" else op0
        DCmp(op, l, parseDPrimary())
      } else if (isIdent("like")) {
        pos += 1; DLike(l, str(), negated = false)
      } else if (isIdent("not")) {
        pos += 1
        if (eatIdent("like")) DLike(l, str(), negated = true)
        else { expectIdent("in"); parseInTail(l, negated = true) }
      } else if (isIdent("in")) {
        pos += 1; parseInTail(l, negated = false)
      } else if (isIdent("is")) {
        pos += 1
        val neg = eatIdent("not")
        expectIdent("null")
        DIsNull(l, neg)
      } else l
    }

    private def parseInTail(l: DExpr, negated: Boolean): DExpr = {
      expectPunct("(")
      if (isIdent("select")) {
        val sub = parseQuery(top = false)
        expectPunct(")")
        DInSub(l, sub, negated)
      } else {
        val vals = ArrayBuffer.empty[Any]
        var f1 = true
        while (f1 || eatPunct(",")) {
          f1 = false
          vals += (cur match {
            case TNum(_)   => val d = num(); if (d == d.toLong) Long.box(d.toLong) else Double.box(d)
            case TStr(s)   => pos += 1; s
            case TIdent("true")  => pos += 1; Boolean.box(true)
            case TIdent("false") => pos += 1; Boolean.box(false)
            case other => throw new IllegalArgumentException(s"bad IN value $other")
          })
        }
        expectPunct(")")
        DIn(l, vals.toSeq, negated)
      }
    }

    private def parseDPrimary(): DExpr = cur match {
      case TNum(_)         => DConst(Double.box(num()))
      case TPunct("-")     => pos += 1; DConst(Double.box(-num()))
      case TStr(s)         => pos += 1; DConst(s)
      case TIdent("true")  => pos += 1; DConst(Boolean.box(true))
      case TIdent("false") => pos += 1; DConst(Boolean.box(false))
      case TIdent("null")  => pos += 1; DConst(null)
      case TPunct("(") =>
        pos += 1; val e = parseDOr(); expectPunct(")"); e
      case TIdent(nm) if toks(pos + 1) == TPunct("(") =>
        pos += 2
        val args = ArrayBuffer.empty[DExpr]
        if (!isPunct(")")) {
          var f1 = true
          while (f1 || eatPunct(",")) { f1 = false; args += parseDOr() }
        }
        expectPunct(")")
        resolveDimFn(nm, args.toSeq)
      case TIdent(nm) => pos += 1; DCol(nm)
      case other => throw new IllegalArgumentException(s"unexpected dim token $other")
    }

    /** Strip the P pushdown prefix (moot on Spark — executors evaluate
      * everything, sql/sql.go:1095-1106) and expand macro aliases.
      */
    private def resolveDimFn(name0: String, args: Seq[DExpr]): DExpr = {
      val up0 = name0.toUpperCase
      val up =
        if (coreDimFns.contains(up0) || customDimFns.contains(up0) ||
            aliasTemplates.containsKey(up0)) up0
        else if (up0.startsWith("P") && (coreDimFns.contains(up0.substring(1)) ||
                 customDimFns.contains(up0.substring(1)) ||
                 aliasTemplates.containsKey(up0.substring(1)))) up0.substring(1)
        else up0
      val tmpl = aliasTemplates.get(up)
      if (tmpl != null) {
        // macro expansion: substitute rendered args into the %v template and
        // re-parse (RegisterAlias, /root/reference/sql/sql.go:1200-1212)
        val rendered = args.map(render)
        var out = tmpl
        rendered.foreach { a => out = out.replaceFirst("%v", java.util.regex.Matcher.quoteReplacement(a)) }
        new P(lex(out)).parseDimExprPublic()
      } else DFn(up, args)
    }

    def parseDimExprPublic(): DExpr = parseDOr()

    private def render(e: DExpr): String = e match {
      case DCol(n)   => n
      case DConst(s: String) => s"'${s.replace("'", "\\'")}'"
      case DConst(null) => "NULL"
      case DConst(v) => v.toString
      case DCmp(op, l, r) => s"${render(l)} $op ${render(r)}"
      case DAnd(l, r) => s"(${render(l)} AND ${render(r)})"
      case DOr(l, r)  => s"(${render(l)} OR ${render(r)})"
      case DNot(c)    => s"NOT (${render(c)})"
      case DFn(f, as) => s"$f(${as.map(render).mkString(", ")})"
      case other => throw new IllegalArgumentException(s"cannot render $other in alias")
    }

    private def parseInstantMillis(s: String): Long = {
      import java.time._
      import java.time.format.DateTimeFormatter
      val attempts: Seq[String => Long] = Seq(
        x => Instant.parse(x).toEpochMilli,
        x => OffsetDateTime.parse(x).toInstant.toEpochMilli,
        x => LocalDateTime.parse(x, DateTimeFormatter.ISO_LOCAL_DATE_TIME)
          .toInstant(ZoneOffset.UTC).toEpochMilli,
        x => LocalDate.parse(x).atStartOfDay.toInstant(ZoneOffset.UTC).toEpochMilli)
      attempts.view.map(f => try Some(f(s)) catch { case _: Exception => None })
        .collectFirst { case Some(ms) => ms }
        .getOrElse(throw new IllegalArgumentException(s"bad time: '$s'"))
    }
  }
}
