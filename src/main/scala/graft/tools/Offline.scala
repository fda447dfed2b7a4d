package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.exprs.Builders
import graft.sqlx.DExpr

/** zenotool parity (/root/reference/cmd/zenotool, merge.go:34-175): offline
  * filter / merge / sort of materialized table stores. On Spark these are
  * trivial batch jobs over the generation parquet — included so a reference
  * user's offline maintenance workflows have a direct equivalent.
  */
object Offline {

  /** Filter a store by time range and/or dim predicate. */
  def filterStore(df: DataFrame,
                  fromMillis: Option[Long] = None,
                  toMillis: Option[Long] = None,
                  where: Option[DExpr] = None): DataFrame = {
    var out = df
    fromMillis.foreach(f => out = out.filter(col("_time") >= timestamp_millis(lit(f))))
    toMillis.foreach(t => out = out.filter(col("_time") < timestamp_millis(lit(t))))
    where.foreach { w =>
      out = out.filter(Builders.dim(w,
        n => if (out.columns.contains(n)) col(n) else lit(null)))
    }
    out
  }

  /** Merge several stores of the SAME table definition into one, re-merging
    * accumulator columns by their merge ops (alias -> op from the table's
    * compiled spec).
    */
  def mergeStores(stores: Seq[DataFrame],
                  accMerge: Seq[(String, Builders.MergeOp)]): DataFrame = {
    require(stores.nonEmpty)
    val unioned = stores.reduce(_.unionByName(_, allowMissingColumns = true))
    val keyCols = unioned.columns.filterNot(c => accMerge.exists(_._1 == c))
    val mergeCols = accMerge.map { case (a, m) => Builders.MergeOp(m, col(a)).as(a) }
    unioned.groupBy(keyCols.map(col): _*)
      .agg(mergeCols.head, mergeCols.tail: _*)
  }

  /** Key-sorted rewrite of a store (the reference's sorted filestore). */
  def sortStore(df: DataFrame, dims: Seq[String]): DataFrame =
    df.repartition(dims.map(col): _*)
      .sortWithinPartitions(("_time" +: dims).map(col): _*)

  /** zenotool `-info` (zenotool.go:26): layout summary of a table store dir
    * straight off the MANIFEST + files — no schema file required. Keys:
    * version, days, generations, buckets, schema_fields, files, bytes.
    */
  def info(storeDir: String): Map[String, Any] = {
    import java.nio.file.{Files, Paths}
    val manifest = Paths.get(storeDir, "MANIFEST")
    require(Files.exists(manifest), s"no MANIFEST under $storeDir")
    val lines = Files.readString(manifest).split("\n").filter(_.nonEmpty)
    val dayLines = lines.filter(_.contains("\tcommits/"))
    val gens = dayLines.map(_.split("\t")(1).split("/")(1)).distinct
    val schemaFields = lines.find(_.startsWith("s=")).map { s =>
      org.apache.spark.sql.types.DataType.fromJson(s.drop(2))
        .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    }.getOrElse(Seq.empty)
    val buckets = lines.find(_.startsWith("p=")).map(_.drop(2).split("\t")(0).toInt)
    var (files, bytes) = (0L, 0L)
    dayLines.foreach { l =>
      val day = Paths.get(storeDir, l.split("\t")(1))
      if (Files.isDirectory(day)) {
        val st = Files.walk(day)
        try {
          val it = st.iterator()
          while (it.hasNext) {
            val p = it.next()
            if (Files.isRegularFile(p)) { files += 1; bytes += Files.size(p) }
          }
        } finally st.close()
      }
    }
    Map("version" -> lines.head.stripPrefix("v=").toLong,
      "days" -> dayLines.length, "generations" -> gens.length,
      "buckets" -> buckets.getOrElse(0), "schema_fields" -> schemaFields,
      "files" -> files, "bytes" -> bytes)
  }

  /** zenotool `-check` (zenotool.go:27): decode EVERY row of every live
    * column — not a footer/row-count shortcut — so bit-rot anywhere in the
    * store surfaces now, not at query time. Throws on the first unreadable
    * file (Spark's error names it); returns the row count scanned.
    */
  def check(spark: SparkSession, storeDir: String): Long = {
    import java.nio.file.{Files, Paths}
    require(Files.exists(Paths.get(storeDir, "MANIFEST")),
      s"no MANIFEST under $storeDir")
    val dayPaths = Files.readString(Paths.get(storeDir, "MANIFEST"))
      .split("\n").filter(_.contains("\tcommits/"))
      .map(l => s"$storeDir/${l.split("\t")(1)}").toSeq
    if (dayPaths.isEmpty) return 0L
    // recursiveFileLookup: no partition inference — several `__day=` roots
    // can't share one discovery pass (see MaterializedTable.openDays), and
    // the check wants data pages, not partition columns
    val df = spark.read.option("recursiveFileLookup", "true")
      .option("mergeSchema", "true").parquet(dayPaths: _*)
    // hash every column of every row: count() alone satisfies itself from
    // row-group metadata without touching the data pages
    df.select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(count(col("h"))).head().getLong(0)
  }
}
