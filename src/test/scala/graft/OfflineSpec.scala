package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.exprs.Builders.MergeOp
import graft.sqlx.{DCmp, DCol, DConst}
import graft.tools.Offline

class OfflineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val T0 = 1700000000000L
  private val sch = StructType(Seq(
    StructField("_time", TimestampType), StructField("k", StringType),
    StructField("__a0", DoubleType)))
  private def store(rows: (Long, String, Double)*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows.map { case (t, k, v) =>
      Row(new java.sql.Timestamp(t), k, Double.box(v))
    }, 2), sch)

  test("filter by time range and dim predicate") {
    val s = store((T0, "a", 1), (T0 + 1000, "a", 2), (T0 + 2000, "b", 3))
    val f = Offline.filterStore(s, fromMillis = Some(T0 + 500),
      where = Some(DCmp("=", DCol("k"), DConst("a"))))
    val got = f.collect()
    assert(got.length == 1 && got(0).getDouble(2) == 2.0)
  }

  test("merge stores re-merges accumulators") {
    val a = store((T0, "a", 1), (T0, "b", 5))
    val b = store((T0, "a", 10), (T0 + 1000, "a", 7))
    val m = Offline.mergeStores(Seq(a, b), Seq("__a0" -> MergeOp.Sum))
      .orderBy("k", "_time").collect()
    assert(m.length == 3)
    assert(m(0).getDouble(2) == 11.0) // (T0, a): 1 + 10
    assert(m(1).getDouble(2) == 7.0)
    assert(m(2).getDouble(2) == 5.0)
  }

  test("sorted rewrite keeps data, orders within partitions") {
    val s = store((T0 + 2000, "b", 3), (T0, "a", 1), (T0 + 1000, "a", 2))
    val sorted = Offline.sortStore(s, Seq("k"))
    assert(sorted.count() == 3)
  }
}
