package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.sqlx.AggOp

/** A queryable table: its DataFrame plus the zenodb-style classification of
  * columns into dims (metadata, groupable/filterable) and vals (float64
  * measures) with an optional time column (SURVEY.md §1.2).
  *
  * `fieldAgg` records, for stored/derived sources, each measure's aggregate
  * kind — the information the reference keeps as each field's expression
  * (table.go:34-64) and uses for bare-column re-aggregation (the SubMerge
  * relation, planner/local.go:85-97). Raw sources default every measure to
  * SUM.
  */
final case class TableDef(
    name: String,
    /** Thunk, not a DataFrame: building one lists the source's files
      * eagerly, and catalogs are rebuilt per query — a time-pruned query
      * over a materialized store must not pay an O(store) listing for a
      * relation it never scans. `df` forces it on first use.
      */
    dfFn: () => DataFrame,
    timeCol: Option[String],
    dims: Seq[String],
    vals: Seq[String],
    fieldAgg: Map[String, AggOp] = Map.empty,
    hasPointsCol: Boolean = false,
    /** Declared bucket resolution for materialized tables; raw sources None. */
    resolution: Option[scala.concurrent.duration.FiniteDuration] = None,
    /** Materialized tables: the defining field exprs, enabling accumulator
      * merge-reads (the SubMerge relation) instead of raw re-accumulation. */
    stored: Option[graft.exprs.Builders.StoredDef] = None,
    /** Time-bounded scan: given (asofMs, untilMs), return a source pruned at
      * the storage layer (manifest day dirs) instead of filtering the full
      * scan. None = source has no storage-level pruning (raw parquet). */
    timePrune: Option[(Option[Long], Option[Long]) => DataFrame] = None,
    /** Retention horizon for materialized tables — defines the source's
      * default asOf (the reference's source.GetAsOf(), core/group.go:92-104)
      * so the period-vs-window cap applies to UNTIL-only queries too. */
    retentionMillis: Option[Long] = None,
    /** Bucket layout of a materialized store: (partitionby dims, count).
      * Day dirs hold `__bucket=murmur3(dims)%count` subdirs; the planner
      * turns a dim-equality WHERE into directory-level partition pruning
      * (the reference's partitionby query routing, README.md:522-529). */
    bucketSpec: Option[(Seq[String], Int)] = None,
    /** Committed column types (manifest schema) — lets the planner compute
      * bucket ids for WHERE literals DRIVER-side without forcing the full
      * relation (building one lists the whole store). */
    dimTypes: Map[String, org.apache.spark.sql.types.DataType] = Map.empty,
    /** Bucket-level scan: given (asofMs, untilMs, bucket ids), return a
      * source opened over ONLY the `__day=d/__bucket=k` dirs the manifest
      * says can hold matching rows — the listing itself is 1/N of the
      * store, not just the scan. None = no bucket-level pruning. */
    bucketPrune: Option[(Option[Long], Option[Long], Set[Int]) => DataFrame] = None) {
  lazy val df: DataFrame = dfFn()
}

/** An ANN index registered for the dialect's `SIMSEARCH` table function:
  * where it lives plus the column names the index stores its ids and
  * vectors under (the probe rebuilds the scoring expression from these).
  * The index kind is read from its own meta (`_centroids.txt` = IVF,
  * `_pq.txt` = IVF-PQ). For a PQ index, `baseTable` names a registered
  * catalog table holding the ORIGINAL vectors (the codes-only index
  * cannot re-rank from itself): when present, probes re-rank the top
  * `refineK` ADC candidates exactly against it; when absent, probes
  * return raw ADC rankings.
  */
final case class AnnIndexDef(path: String, vecCol: String, idCol: String,
                             quantized: Boolean = true,
                             baseTable: Option[String] = None,
                             refineK: Int = 0)

/** Registry of queryable tables. Parquet-backed construction classifies
  * columns by type: Float/Double columns are measures, everything else is a
  * dimension, the first timestamp column is the time axis.
  */
final class Catalog(private val tables: Map[String, TableDef],
                    private val annIndexes: Map[String, AnnIndexDef] = Map.empty) {
  def get(name: String): TableDef =
    tables.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(
        s"Table or view '$name' not found (known: ${tables.keys.toSeq.sorted.mkString(", ")})"))
  def contains(name: String): Boolean = tables.contains(name.toLowerCase)
  def names: Seq[String] = tables.keys.toSeq.sorted
  def add(t: TableDef): Catalog =
    new Catalog(tables + (t.name.toLowerCase -> t), annIndexes)
  def addAnn(name: String, d: AnnIndexDef): Catalog =
    new Catalog(tables, annIndexes + (name.toLowerCase -> d))
  def getAnn(name: String): AnnIndexDef =
    annIndexes.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(
        s"ANN index '$name' not registered (known: " +
          s"${annIndexes.keys.toSeq.sorted.mkString(", ")})"))
}

object Catalog {

  val testTableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Classify one DataFrame into a TableDef by schema. Timestamp columns are
    * normalized to session-TZ TimestampType (parquet ms-timestamps arrive as
    * TIMESTAMP_NTZ in Spark 4; driver data is UTC, session is UTC, so the
    * cast is value-preserving). A LongType column literally named `ts` is
    * treated as epoch nanos (parquet TIMESTAMP(NANOS) read via
    * `nanosAsLong`).
    */
  def classify(name: String, df0: DataFrame): TableDef = {
    import org.apache.spark.sql.functions._
    var df = df0
    df0.schema.fields.foreach { f =>
      f.dataType match {
        case TimestampNTZType =>
          df = df.withColumn(f.name, col(f.name).cast(TimestampType))
        case DateType =>
          // DATE-typed time columns (common in real parquet) participate in
          // period()/ASOF like timestamps — midnight UTC of the day
          df = df.withColumn(f.name, col(f.name).cast(TimestampType))
        case LongType if f.name == "ts" =>
          // integer `div`: epoch nanos exceed double's exact range
          df = df.withColumn(f.name,
            timestamp_millis(expr(s"`${f.name}` div 1000000")))
        case _ => ()
      }
    }
    val fields = df.schema.fields
    val timeCol = fields.collectFirst {
      case f if f.dataType == TimestampType => f.name
    }
    val vals = fields.collect {
      case f if f.dataType == DoubleType || f.dataType == FloatType => f.name
    }.toSeq
    val dims = fields.map(_.name)
      .filterNot(vals.contains).filterNot(timeCol.contains).toSeq
    val dfF = df
    TableDef(name.toLowerCase, () => dfF, timeCol, dims, vals,
      hasPointsCol = fields.exists(_.name == "_points"))
  }

  /** Load every parquet table under a scale-factor dir lazily. */
  def fromParquetDir(spark: SparkSession, dir: String,
                     names: Seq[String] = testTableNames): Catalog = {
    // parquet TIMESTAMP(NANOS) (events.ts) is unreadable without this legacy
    // switch; classify() converts the resulting long back to a timestamp
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    new Catalog(names.flatMap { n =>
      val path = s"$dir/$n.parquet"
      try Some(n -> classify(n, spark.read.parquet(path)))
      catch { case _: Exception => None }
    }.toMap)
  }
}
