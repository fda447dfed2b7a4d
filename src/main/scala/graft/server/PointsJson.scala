package graft.server

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftDB

/** Shared point-JSON decoding for the HTTP and RPC surfaces
  * (/root/reference/web/insert.go:22-47): JSON lines
  * `{"ts": epochMillis|RFC3339, "dims": {..}, "vals": {..}}` → a flat
  * point DataFrame (`ts` timestamp, dim columns, double val columns).
  */
object PointsJson {

  def toDataFrame(spark: SparkSession, jsonLines: String): DataFrame = {
    import spark.implicits._
    // FAILFAST: a malformed line must 400 the request, like the
    // reference's per-line decode error (web/insert.go:34-38). The
    // default PERMISSIVE mode would fold bad lines into a
    // `_corrupt_record` column that then flowed into the store as a
    // literal DIM — silently materializing garbage group keys. Schema
    // VARIANCE across lines stays fine (points carry heterogeneous
    // dims; absent fields read null) — only unparseable JSON fails.
    val raw = spark.read.option("mode", "FAILFAST").json(
      spark.createDataset(jsonLines.split("\n").toSeq.filter(_.trim.nonEmpty)))
    // ts: epoch millis number, RFC3339 string, or absent (=now)
    val withTs =
      if (!raw.columns.contains("ts"))
        raw.withColumn("ts", timestamp_millis(lit(System.currentTimeMillis())))
      else raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.StringType =>
          raw.withColumn("ts", to_timestamp(col("ts")))
        case _: org.apache.spark.sql.types.NumericType =>
          raw.withColumn("ts", timestamp_millis(col("ts").cast("long")))
        case _ => raw
      }
    def flatten(df: DataFrame, structCol: String, asDouble: Boolean): DataFrame =
      if (!df.columns.contains(structCol)) df
      else {
        val sub = df.schema(structCol).dataType
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        val cols = sub.fields.map { f =>
          val c = col(s"$structCol.${f.name}")
          (if (asDouble) c.cast("double") else c).as(f.name)
        }
        df.select((df.columns.filterNot(_ == structCol).map(col) ++ cols): _*)
      }
    flatten(flatten(withTs, "dims", asDouble = false), "vals", asDouble = true)
  }

  /** Decode + insert; returns the point count. */
  def insert(spark: SparkSession, db: GraftDB, stream: String,
             jsonLines: String): Long = {
    val flat = toDataFrame(spark, jsonLines)
    val n = flat.count()
    db.insert(stream, flat)
    n
  }
}
