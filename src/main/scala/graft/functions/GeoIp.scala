package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.exprs.Builders

/** Geo / ISP dimension functions (reference sql/sql.go:81-89:
  * CITY, REGION, REGION_CITY, COUNTRY_CODE backed by a MaxMind city DB;
  * ISP, ORG, ASN, ASNAME backed by an IP2Location-style provider,
  * zenodb.go:256-276). The reference opens a local .mmdb file per process;
  * the Spark-native equivalent is an IP-range table — any DataFrame with
  * `start_ip`/`end_ip` plus value columns — collected once, broadcast to
  * every executor, and probed by the codegen'd [[RangeLookup]] binary
  * search. No per-row UDF, no join, no shuffle: a GROUP BY CITY(ip) plans
  * exactly like a GROUP BY over a physical column.
  *
  * Scale: GeoLite2-city is ~3.5M ranges; three primitive arrays ≈ 120 MB
  * broadcast once per executor — the same footprint the reference pays per
  * process for the mmdb, with O(log n) per-row probes inside whole-stage
  * codegen. For a multi-TB *ranges* table this would flip to a broadcast
  * range-join; IP geo data never approaches that.
  */
object GeoIp {

  /** ranges column name → dim function it backs. */
  private val FieldFns = Seq(
    "city" -> "CITY", "region" -> "REGION", "country_code" -> "COUNTRY_CODE",
    "isp" -> "ISP", "org" -> "ORG", "asn" -> "ASN", "asname" -> "ASNAME")

  /** Install providers for every value column present in `ranges`
    * (`start_ip`, `end_ip` [long, inclusive] + any of city/region/
    * country_code/isp/org/asn/asname). REGION_CITY composes as
    * "<region>, <city>" when both backing columns exist.
    *
    * The function argument may be an integral IP or a dotted-quad string;
    * unresolvable IPs yield NULL (the reference's nil).
    */
  def install(spark: SparkSession, ranges: DataFrame): Unit = {
    val present = FieldFns.filter { case (c, _) => ranges.columns.contains(c) }
    require(present.nonEmpty,
      s"ranges has none of ${FieldFns.map(_._1).mkString("/")}")
    val rows = ranges
      .select(col("start_ip").cast("long") +: col("end_ip").cast("long") +:
        present.map { case (c, _) => col(c).cast("string") }: _*)
      .collect()
    present.zipWithIndex.foreach { case ((_, fn), i) =>
      val table = RangeTable.fromRows(rows.toSeq.map { r =>
        (r.getLong(0), r.getLong(1), if (r.isNullAt(i + 2)) null else r.getString(i + 2))
      })
      val bc = spark.sparkContext.broadcast(table)
      Builders.registerDimFnProvider(fn, cols => RangeLookup(cols.head, bc))
    }
    if (present.exists(_._2 == "REGION") && present.exists(_._2 == "CITY"))
      Builders.registerDimFnProvider("REGION_CITY",
        cols => concat_ws(", ",
          Builders.dimFnColumn("REGION", cols),
          Builders.dimFnColumn("CITY", cols)))
  }

  /** Dotted-quad string column → unsigned-32 numeric IP (null-safe), for
    * callers that want the numeric form as its own dimension.
    */
  def ipToLong(ip: Column): Column =
    shiftleft(element_at(split(ip, "\\."), 1).cast("long"), 24) +
      shiftleft(element_at(split(ip, "\\."), 2).cast("long"), 16) +
      shiftleft(element_at(split(ip, "\\."), 3).cast("long"), 8) +
      element_at(split(ip, "\\."), 4).cast("long")
}
