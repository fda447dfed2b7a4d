package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded differential fuzz: random dialect queries over lineitem compared
  * against hand-built DataFrame equivalents — broad coverage of the
  * parser → planner → builders path beyond the fixed oracle set.
  */
class FuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private lazy val catalog = Catalog.fromParquetDir(spark, dir, Seq("lineitem"))
  private lazy val li = catalog.get("lineitem").df

  private case class AggPick(sql: String, name: String, direct: Column)

  test("40 random group/agg/filter/having/order queries match direct DataFrame builds") {
    val rnd = new scala.util.Random(20260812L)
    val dims = Seq("l_returnflag", "l_linestatus", "l_suppkey")
    val aggPool: Seq[() => AggPick] = Seq(
      () => AggPick("SUM(l_quantity)", "a1", sum(col("l_quantity"))),
      () => AggPick("MIN(l_quantity)", "a2", min(col("l_quantity"))),
      () => AggPick("MAX(l_quantity)", "a3", max(col("l_quantity"))),
      () => AggPick("COUNT(l_quantity)", "a4", count(col("l_quantity")).cast("double")),
      () => AggPick("AVG(l_quantity)", "a5", sum(col("l_quantity")) / count(col("l_quantity"))),
      () => AggPick("SUM(l_discount * 100)", "a6", sum(col("l_discount") * 100)),
      () => AggPick("IF(l_returnflag = 'R', l_quantity)", "a7",
        sum(when(col("l_returnflag") === "R", col("l_quantity")))),
      () => AggPick("COUNT(BOUNDED(l_quantity, 5, 25))", "a8",
        count(when(col("l_quantity").between(5, 25), col("l_quantity"))).cast("double")),
      () => AggPick("_points", "a9", count(lit(1)).cast("double")))

    val wherePool: Seq[(String, Column)] = Seq(
      ("l_quantity > 25" -> (col("l_quantity") > 25)),
      ("l_returnflag IN ('R', 'A')" -> col("l_returnflag").isin("R", "A")),
      ("l_linestatus = 'F' AND l_suppkey >= 3" ->
        (col("l_linestatus") === "F" && col("l_suppkey") >= 3)),
      ("l_returnflag <> 'N' OR l_quantity <= 10" ->
        (col("l_returnflag") =!= "N" || col("l_quantity") <= 10)))

    var checked = 0
    for (i <- 0 until 40) {
      val gDims = rnd.shuffle(dims).take(1 + rnd.nextInt(2))
      val nAggs = 1 + rnd.nextInt(3)
      val aggs = rnd.shuffle(aggPool).take(nAggs).map(_())
      val where = if (rnd.nextBoolean()) Some(wherePool(rnd.nextInt(wherePool.size))) else None
      val useHaving = rnd.nextBoolean() && aggs.exists(_.name == "a1")

      val sql = new StringBuilder("SELECT ")
      sql.append(aggs.map(a =>
        if (a.sql == "_points") "_points" else s"${a.sql} AS ${a.name}").mkString(", "))
      sql.append(" FROM lineitem")
      where.foreach { case (w, _) => sql.append(s" WHERE $w") }
      sql.append(" GROUP BY ").append(gDims.mkString(", "))
      if (useHaving) sql.append(" HAVING a1 > 100")
      sql.append(" ORDER BY ").append(gDims.mkString(", "))

      val got = Engine.sql(catalog, sql.toString).collect()

      var direct: DataFrame = li
      where.foreach { case (_, c) => direct = direct.filter(c) }
      val aggCols = aggs.map(a =>
        a.direct.as(if (a.sql == "_points") "_points" else a.name))
      direct = direct.groupBy(gDims.map(col): _*)
        .agg(aggCols.head, aggCols.tail: _*)
      if (useHaving) direct = direct.filter(col("a1") > 100.0)
      // flatten-skip parity: drop rows where every selected value is null
      val fieldNames = aggs.map(a => if (a.sql == "_points") "_points" else a.name)
      direct = direct.filter(fieldNames.map(n => col(n).isNotNull).reduce(_ || _))
      val want = direct.orderBy(gDims.map(col): _*).collect()

      assert(got.length == want.length,
        s"[case $i] row count ${got.length} vs ${want.length}\n$sql")
      got.zip(want).foreach { case (g, w) =>
        gDims.foreach(d => assert(g.getAs[Any](d) == w.getAs[Any](d),
          s"[case $i] dim $d differs\n$sql"))
        fieldNames.foreach { n =>
          val (a, b) = (g.getAs[Any](n), w.getAs[Any](n))
          val ok = (a == null && b == null) ||
            (a != null && b != null &&
              math.abs(a.toString.toDouble - b.toString.toDouble) < 1e-9)
          assert(ok, s"[case $i] field $n: $a vs $b\n$sql")
        }
      }
      checked += 1
    }
    assert(checked == 40)
  }

  test("30 random period/dim-fn/arithmetic queries over events match direct builds") {
    val cat = Catalog.fromParquetDir(spark, dir, Seq("events"))
    val ev = cat.get("events").df
    val rnd = new scala.util.Random(42L)
    val periods = Seq(3600000L -> "period('1h')", 21600000L -> "period('6h')",
      86400000L -> "period('1d')")

    for (i <- 0 until 30) {
      val (bucketMs, periodSql) = periods(rnd.nextInt(periods.size))
      val dimPick = rnd.nextInt(3)
      val (dimSql, dimName, dimCol) = dimPick match {
        case 0 => ("event_type", "event_type", col("event_type"))
        case 1 => ("CONCAT('_', event_type, user_id) AS c", "c",
          concat_ws("_", col("event_type"), col("user_id")))
        case 2 => ("SUBSTR(event_type, 1, 3) AS c", "c",
          col("event_type").substr(1, 3))
      }
      val arith = rnd.nextInt(3)
      val (fSql, fDirect): (String, Seq[Column] => Column) = arith match {
        case 0 => ("SUM(value * 100) / 100 AS f" -> (a => a(0) / 100))
        case 1 => ("SUM(value * 100) / _points AS f" -> (a => a(0) / a(1)))
        case 2 => ("LOG10(_points) AS f" -> (a => log10(a(1))))
      }
      val whereSql = if (rnd.nextBoolean()) " WHERE user_id < 300" else ""

      val sql = s"SELECT $fSql, _points FROM events$whereSql " +
        s"GROUP BY $dimSql, $periodSql ORDER BY _time, $dimName"
      val got = Engine.sql(cat, sql).collect()

      var direct = ev
      if (whereSql.nonEmpty) direct = direct.filter(col("user_id") < 300)
      val bucket = timestamp_millis(
        (floor(unix_millis(col("ts")) / lit(bucketMs.toDouble)) * bucketMs)
          .cast("long")).as("_time")
      val sumv = sum(col("value") * 100)
      val pts = count(lit(1)).cast("double")
      direct = direct.groupBy(bucket, dimCol.as(dimName))
        .agg(sumv.as("__s"), pts.as("_points"))
        .withColumn("f", fDirect(Seq(col("__s"), col("_points"))))
        .drop("__s")
        .orderBy(col("_time"), col(dimName))
      val want = direct.collect()

      assert(got.length == want.length,
        s"[case $i] rows ${got.length} vs ${want.length}\n$sql")
      got.zip(want).foreach { case (g, w) =>
        assert(g.getAs[Any](dimName) == w.getAs[Any](dimName), s"[case $i] dim\n$sql")
        assert(g.getAs[java.sql.Timestamp]("_time") == w.getAs[java.sql.Timestamp]("_time"),
          s"[case $i] time\n$sql")
        for (n <- Seq("f", "_points")) {
          val (a, b) = (g.getAs[Any](n), w.getAs[Any](n))
          val ok = (a == null && b == null) || (a != null && b != null &&
            math.abs(a.toString.toDouble - b.toString.toDouble) <=
              1e-9 * math.max(1.0, math.abs(b.toString.toDouble)))
          assert(ok, s"[case $i] $n: $a vs $b\n$sql")
        }
      }
    }
  }
}
