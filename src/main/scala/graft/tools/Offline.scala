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
}
