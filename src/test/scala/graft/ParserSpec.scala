package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sqlx._

class ParserSpec extends AnyFunSuite {

  test("durations parse and format like the reference grammar") {
    assert(Durations.parseMillis("5s") == 5000L)
    assert(Durations.parseMillis("-1h") == -3600000L)
    assert(Durations.parseMillis("1h30m") == 5400000L)
    assert(Durations.parseMillis("2d") == 172800000L)
    assert(Durations.parseMillis("1w") == 604800000L)
    assert(Durations.parseMillis("250ms") == 250L)
    // formatting mirrors durationToString (sql/duration.go:184-200 +
    // sql_test.go:27 expecting "23h55m0s")
    assert(Durations.format(23 * 3600000L + 55 * 60000L) == "23h55m0s")
    assert(Durations.format(1000L) == "1s")
    assert(Durations.format(2000L) == "2s")
    assert(Durations.format(86400000L) == "1d")
    assert(Durations.format(8 * 86400000L) == "1w1d")
    assert(Durations.format(3600000L) == "1h0m0s")
  }

  test("full dialect golden query parses (reference sql_test.go:35-130)") {
    Parser.registerDimFunction("TEST")
    Parser.registerAlias("MYALIAS", "ANY(%v, PHGET('hash', %v), %v)")
    Parser.registerAlias("PLUA", "LUA('myscript', ARRAY('ka', 'kb'), ARRAY(%v, %v))")
    val q = Parser.parse("""
SELECT -- force_fresh
	AVG(a) / (SUM(A) + SUM(b) + SUM(C)) * 2 AS rate,
	myfield,
	`knownfield`,
	IF(dim = 'test', AVG(myfield)) AS the_avg,
	*,
	SUM(BOUNDED(bfield, 0, 100)) AS bounded,
	5 as cval,
	WAVG(a, b) AS weighted,
	IF(dim = 'test2', _) AS present,
	SHIFT(SUM(s), '1h') AS shifted,
	CROSSHIFT(cs, '-1w', '1d'),
	LN(l) AS log1,
	LOG2(l) AS log2,
	LOG10(l) AS log3,
	SUM(p) AS p,
	PERCENTILE(ptile, 1, 0, 0, 1) AS ptile2,
	PERCENTILE(ptile, 2) AS ptile2_opt,
	PERCENTILE(myfield / 10, 1, 0, 0, 1) AS ptile3
FROM Table_A ASOF '-1w' UNTIL '-15m'
WHERE
	Dim_a LIKE '172.56.' AND
	dim_b > 10 OR (dim_c = 20 OR dim_d <> 'thing') AND
	dim_e NOT LIKE 'no such host' AND
	dim_f != true AND
	dim_g IS NULL AND
	dim_h IS NOT NULL AND
	dim_i IN (5, 6, 7, 8) AND
	dim_j IN (SELECT subdim FROM subtable WHERE subdim > 20 HAVING something > 2) AND
	RAND() < 0.5
GROUP BY
	dim_a,
	CROSSTABT(dim_b, dim_ct),
	PISP(ip) AS isp,
	ORG(ip) AS org,
	CITY(ip) AS city,
	PCONCAT('|', part_a, part_b) AS joined,
	TEST(dim_k) AS test_dim_k,
	MyAlias(dim_l, dim_m, dim_n) AS any_of_three,
	SPLIT(dim_o, ',', 2) AS spl,
	LEN(dim_q) AS qlen,
	REPLACEALL(dim_r, 'regex', 'replacement') AS replaced,
	DECODE(dim_q, 1, 'ok', 'default') AS decoded,
	period('5s'),
	STRIDE('1d')
HAVING Rate > 15 AND H < 2
ORDER BY Rate DESC, x, y
LIMIT 100, 10
""")
    assert(q.forceFresh)
    assert(q.selectAll)
    assert(q.from == FromTable("table_a"))
    assert(q.asOf.contains(TimeRel(-604800000L)))
    assert(q.until.contains(TimeRel(-900000L)))
    // CROSSHIFT '-1w' cutoff / '1d' interval = 7 fields: cs, cs_1d..cs_6d
    val csFields = q.fields.filter(_.name.startsWith("cs"))
    assert(csFields.map(_.name) ==
      Seq("cs", "cs_1d", "cs_2d", "cs_3d", "cs_4d", "cs_5d", "cs_6d"))
    assert(q.fields.exists(f => f.name == "rate" &&
      f.expr.isInstanceOf[MArith]))
    assert(q.fields.find(_.name == "cval").get.expr == MConst(5.0))
    assert(q.fields.find(_.name == "weighted").get.expr ==
      MWAvg(MField("a"), MField("b")))
    assert(q.fields.find(_.name == "ptile2_opt").get.expr ==
      MPercentileOpt(MField("ptile"), MConst(2.0)))
    // the POSITIVE SQL spelling '1h' stores the NEGATED (store-side)
    // offset: look-forward, the reference's sign semantics (seq.go:244).
    // The idiomatic '-1h' stores +3600000 (look-back) — pinned below.
    assert(q.fields.find(_.name == "shifted").get.expr ==
      MShift(MAgg(AggOp.Sum, MField("s")), -3600000L, "1h0m0s"))
    assert(Parser.parse("SELECT SHIFT(SUM(s), '-1h') AS sh FROM t")
      .fields.head.expr ==
      MShift(MAgg(AggOp.Sum, MField("s")), 3600000L, "1h0m0s"))
    // alias expansion: MYALIAS -> ANY(dim_l, HGET('hash', dim_m), dim_n)
    val anyOf = q.groupBy.collectFirst { case GroupExpr("any_of_three", e) => e }.get
    assert(anyOf == DFn("ANY", Seq(DCol("dim_l"),
      DFn("HGET", Seq(DConst("hash"), DCol("dim_m"))), DCol("dim_n"))))
    // P-prefix stripped
    assert(q.groupBy.collectFirst { case GroupExpr("isp", e) => e }.get ==
      DFn("ISP", Seq(DCol("ip"))))
    assert(q.groupBy.collectFirst { case GroupExpr("joined", e) => e }.get ==
      DFn("CONCAT", Seq(DConst("|"), DCol("part_a"), DCol("part_b"))))
    assert(q.crosstab.size == 2 && q.crosstabTotal)
    assert(q.resolution.map(_.toMillis).contains(5000L))
    assert(q.stride.map(_.toMillis).contains(86400000L))
    assert(q.having.nonEmpty)
    assert(q.orderBy == Seq(OrderSel("rate", desc = true),
      OrderSel("x", desc = false), OrderSel("y", desc = false)))
    assert(q.offset == 100 && q.limit.contains(10))
    // IN-subquery survives in WHERE
    def findSub(e: DExpr): Boolean = e match {
      case DInSub(DCol("dim_j"), sub, _) =>
        sub.from == FromTable("subtable") && sub.having.nonEmpty
      case DAnd(l, r) => findSub(l) || findSub(r)
      case DOr(l, r)  => findSub(l) || findSub(r)
      case _          => false
    }
    assert(findSub(q.where.get))
  }

  test("bare columns default and _ constructs parse") {
    val q = Parser.parse(
      "SELECT foo, _points, _ AS present FROM t GROUP BY _, period('1h')")
    assert(q.fields.head == FieldSel("foo", MBare("foo")))
    assert(q.fields(1) == FieldSel("_points", MAgg(AggOp.Sum, MField("_point"))))
    assert(q.fields(2).name == "present")
    assert(q.groupBy.isEmpty && !q.groupByAll)
    assert(q.resolution.map(_.toMillis).contains(3600000L))
  }

  test("aliases props file registers expression aliases") {
    // /root/reference/quickstart_aliases.props format
    Parser.registerAliasesProps(
      """# comment
        |IS_SUCCESS = %v = 200
        |NON_EMPTY = LEN(%v) > 0
        |""".stripMargin)
    val q = Parser.parse("SELECT x FROM t WHERE IS_SUCCESS(status)")
    assert(q.where.contains(DCmp("=", DCol("status"), DConst(Double.box(200.0)))))
  }

  test("LIMIT without offset, WHERE IN list, subquery FROM") {
    val q = Parser.parse(
      "SELECT a FROM (SELECT b AS a FROM x GROUP BY *) WHERE d IN ('p', 'q') LIMIT 7")
    assert(q.limit.contains(7) && q.offset == 0)
    q.from match {
      case FromSub(sub) => assert(sub.groupByAll)
      case other        => fail(s"expected subquery, got $other")
    }
    assert(q.where.contains(DIn(DCol("d"), Seq("p", "q"), negated = false)))
  }

  test("hostile nesting hits the depth cap, never the JVM stack") {
    // the parser serves untrusted input (HTTP /run, RPC QUERY): a nesting
    // bomb used to die with StackOverflowError, an Error that escapes the
    // servers' `catch Exception` and kills the handler thread silently
    val bombs = Seq(
      "SELECT " + ("(" * 20000) + "x" + (")" * 20000) + " FROM t GROUP BY k",
      "SELECT x FROM t WHERE " + ("NOT (" * 20000) + "a = 1" + (")" * 20000),
      "SELECT x FROM " + ("(SELECT x FROM " * 20000) + "t" + (")" * 20000),
      // unary-minus chains recurse through num(), not the paren path
      "SELECT x FROM t GROUP BY k LIMIT " + ("- " * 20000) + "1")
    for (b <- bombs) {
      val e = intercept[IllegalArgumentException](Parser.parse(b))
      assert(String.valueOf(e.getMessage).contains("nesting"), e.getMessage)
    }
    // a self-referential alias re-parses through a FRESH parser instance —
    // the depth budget is thread-shared so the cycle trips the cap instead
    // of overflowing the stack at query time
    Parser.registerAlias("SPEC_CYCLE", "SPEC_CYCLE(%v)")
    val rec = intercept[IllegalArgumentException](
      Parser.parse("SELECT x FROM t GROUP BY SPEC_CYCLE(k) AS g"))
    assert(String.valueOf(rec.getMessage).contains("nesting"), rec.getMessage)
    // ...and the depth budget unwinds cleanly: the next parse is unaffected
    assert(Parser.parse("SELECT x FROM t GROUP BY k").fields.nonEmpty)
    // WIDE input (no nesting) is iterative and must still parse fine
    val wide = "SELECT x FROM t WHERE " +
      Seq.fill(20000)("a = 1").mkString(" AND ") + " GROUP BY k"
    assert(Parser.parse(wide).where.nonEmpty)
    // sane real-world depth stays comfortably under the cap
    val ok = "SELECT " + ("(" * 50) + "x" + (")" * 50) + " FROM t GROUP BY k"
    assert(Parser.parse(ok).fields.nonEmpty)
  }

  test("SIMSEARCH grammar: literal and TABLE forms parse; malformed forms refuse") {
    import graft.sqlx._
    // literal form
    val lit = Parser.parse(
      "SELECT score FROM SIMSEARCH('idx', [0.5, -1.25, 3], 10, 4) GROUP BY id")
    assert(lit.from === FromSimSearch("idx", Seq(0.5f, -1.25f, 3f), 10, 4))
    // TABLE form (batch mode)
    val tab = Parser.parse(
      "SELECT score FROM SIMSEARCH('idx', TABLE qvecs, 3, 2) GROUP BY qid, id, rank")
    assert(tab.from === FromSimSearch("idx", Nil, 3, 2, Some("qvecs")))
    // malformed: empty vector, non-positive k/nProbe, missing table name
    for (bad <- Seq(
        "SELECT score FROM SIMSEARCH('idx', [], 3, 2) GROUP BY id",
        "SELECT score FROM SIMSEARCH('idx', [1.0], 0, 2) GROUP BY id",
        "SELECT score FROM SIMSEARCH('idx', [1.0], 3, 0) GROUP BY id",
        "SELECT score FROM SIMSEARCH('idx', TABLE, 3, 2) GROUP BY qid"))
      intercept[IllegalArgumentException](Parser.parse(bad))
  }

  test("lexer hardening: quote escapes, unterminated strings, scientific notation") {
    import graft.sqlx._
    // both SQL escape styles yield ONE string token (the reference's
    // MySQL-dialect parser accepts both)
    val doubled = Parser.parse("SELECT v FROM t WHERE s = 'it''s'")
    val backslash = Parser.parse("SELECT v FROM t WHERE s = 'it\\'s'")
    for (q <- Seq(doubled, backslash))
      assert(q.where.contains(DCmp("=", DCol("s"), DConst("it's"))), q.where)
    // a truncated query must fail loud, not silently parse as a DIFFERENT
    // valid query with an implicitly-closed literal
    val e = intercept[IllegalArgumentException](
      Parser.parse("SELECT v FROM t WHERE s = 'oops"))
    assert(e.getMessage.contains("unterminated string"), e.getMessage)
    // scientific-notation literals lex as one number (previously the
    // mantissa lexed as a duration-style ident and the parse failed)
    val sci = Parser.parse("SELECT v FROM t WHERE a > -1.5e-3 AND b < 2E8")
    val cmp = sci.where.get.asInstanceOf[DAnd]
    assert(cmp.l.asInstanceOf[DCmp].r == DConst(-1.5e-3))
    assert(cmp.r.asInstanceOf[DCmp].r == DConst(2.0e8))
    // guards with the offending value named, instead of a Spark-internal
    // failure mid-plan
    val z = intercept[IllegalArgumentException](
      Parser.parse("SELECT v FROM t GROUP BY k, period(0s)"))
    assert(z.getMessage.contains("non-zero"), z.getMessage)
    val lim = intercept[IllegalArgumentException](
      Parser.parse("SELECT v FROM t LIMIT -1"))
    assert(lim.getMessage.contains("non-negative"), lim.getMessage)
  }
}
