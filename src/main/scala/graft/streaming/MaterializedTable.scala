package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.exprs.Builders
import graft.schema.TableConfig
import graft.sqlx._

/** A continuously-maintained materialized aggregation over a stream — the
  * zenodb Table (/root/reference/table.go, SURVEY.md §1.1). Never stores
  * individual points: each micro-batch partially aggregates into
  * (dims, time-bucket) accumulator rows and MERGES with the store, so
  * arbitrarily-late points (within retention) land in their historical
  * bucket — the semantics plain watermark+append streaming cannot express
  * (SURVEY.md §7.4 risk #1).
  *
  * Storage is generation dirs of parquet (`gen=N/`), swapped atomically via
  * a marker file — the moral equivalent of the reference's
  * `filestore_<nanos>` generations (row_store.go:424). At cluster scale the
  * same merge is a Delta MERGE keyed on (dims, _time); the parquet-generation
  * fallback keeps this repo dependency-free.
  */
final class MaterializedTable(
    spark: SparkSession,
    val config: TableConfig,
    val query: Query, // resolved definition (views already merged)
    storePath: String,
    now: () => Long) {

  require(query.resolution.isDefined,
    s"table ${config.name} needs period(...) in its GROUP BY")
  require(query.crosstab.isEmpty && query.having.isEmpty && query.orderBy.isEmpty,
    s"table ${config.name}: CROSSTAB/HAVING/ORDER BY are query-time features")

  val resolutionMillis: Long = query.resolution.get.toMillis

  /** Defining fields incl the implicit `_points` (core/core.go:26). */
  val tableFields: Seq[FieldSel] = {
    val explicit = query.fields.map(f => FieldSel(f.name, resolveBare(f.expr)))
    if (explicit.exists(_.name == "_points")) explicit
    else explicit :+ FieldSel("_points", MAgg(AggOp.Sum, MField("_point")))
  }

  // bare columns in a table definition always mean SUM over the raw stream
  private def resolveBare(e: MExpr): MExpr = e match {
    case MBare(n)             => MAgg(AggOp.Sum, MField(n))
    case MAgg(op, c)          => MAgg(op, resolveBare(c))
    case MWAvg(x, w)          => MWAvg(resolveBare(x), resolveBare(w))
    case MPercentile(c, p, lo, hi, pr) =>
      MPercentile(resolveBare(c), resolveBare(p), lo, hi, pr)
    case MPercentileOpt(c, p) => MPercentileOpt(resolveBare(c), resolveBare(p))
    case MIf(cond, c)         => MIf(cond, resolveBare(c))
    case MBounded(c, lo, hi)  => MBounded(resolveBare(c), lo, hi)
    case MShift(c, off, sfx)  => MShift(resolveBare(c), off, sfx)
    case MArith(op, l, r)     => MArith(op, resolveBare(l), resolveBare(r))
    case MCond(op, l, r)      => MCond(op, resolveBare(l), resolveBare(r))
    case MMath(fn, c)         => MMath(fn, resolveBare(c))
    case other                => other
  }

  /** Explicit dims from GROUP BY; with GROUP BY * the dim set is derived per
    * batch (all input columns that aren't the time column or a measure).
    */
  private def measureLeaves(e: MExpr): Set[String] = e match {
    case MField(n)            => if (n == "_point") Set.empty else Set(n)
    case MAgg(_, c)           => measureLeaves(c)
    case MWAvg(x, w)          => measureLeaves(x) ++ measureLeaves(w)
    case MPercentile(c, p, _, _, _) => measureLeaves(c) ++ measureLeaves(p)
    case MPercentileOpt(c, p) => measureLeaves(c) ++ measureLeaves(p)
    case MIf(_, c)            => measureLeaves(c)
    case MBounded(c, _, _)    => measureLeaves(c)
    case MShift(c, _, _)      => measureLeaves(c)
    case MArith(_, l, r)      => measureLeaves(l) ++ measureLeaves(r)
    case MCond(_, l, r)       => measureLeaves(l) ++ measureLeaves(r)
    case MMath(_, c)          => measureLeaves(c)
    case _                    => Set.empty
  }

  private val valNames: Set[String] = tableFields.flatMap(f => measureLeaves(f.expr)).toSet

  private val genMarker = Paths.get(storePath, "CURRENT")
  private def genPath(g: Long) = s"$storePath/gen=$g"

  def currentGen: Option[Long] =
    if (Files.exists(genMarker)) Some(Files.readString(genMarker).trim.toLong)
    else None

  /** Current materialized state, or an empty frame with just the keys. */
  def read(): Option[DataFrame] = currentGen.map(g => spark.read.parquet(genPath(g)))

  /** Dim columns of the store (everything except _time and accumulators). */
  def storedDims: Seq[String] =
    read().map(_.columns.filterNot(c => c == "_time" || c.startsWith("__a")).toSeq)
      .getOrElse(explicitDims)

  private def explicitDims: Seq[String] = query.groupBy.map(_.name)

  /** Ingest one batch of points (the body of `foreachBatch` for streams; the
    * direct path for batch inserts). WAL semantics land for free: streaming
    * checkpoints track offsets, batch callers own their replay.
    */
  def mergeBatch(batch0: DataFrame): Unit = synchronized {
    val tsCol = batch0.columns.find(_ == "ts").getOrElse(
      throw new IllegalArgumentException("point batches need a `ts` column"))
    var batch = batch0
    val dimResolve: String => Column = n =>
      if (batch.columns.contains(n)) col(n) else lit(null)

    // array vals fan out into extra point-inserts, element 0 riding with the
    // main insert's other vals (/root/reference/insert.go:214-252)
    batch.schema.fields
      .filter(f => valNames.contains(f.name) &&
        f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
      .map(_.name).foreach { c =>
        val nonVal = batch.columns.filterNot(valNames.contains)
        val otherVals = batch.columns.filter(x => valNames.contains(x) && x != c)
        val ex = batch.select(
          (nonVal.map(col) ++ otherVals.map(col) :+
            posexplode_outer(col(c)).as(Seq("__pos", "__el"))): _*)
        batch = ex.select(
          (nonVal.map(col) ++
            otherVals.map(oc =>
              when(col("__pos").isNull || col("__pos") === 0, col(oc)).as(oc)) :+
            col("__el").cast("double").as(c)): _*)
      }

    // table WHERE pre-filter (insert.go:175-189)
    query.where.foreach(w => batch = batch.filter(Builders.dim(w, dimResolve)))
    // points older than the retention horizon are dropped (insert.go:131-136)
    config.retentionMillis.foreach { r =>
      batch = batch.filter(col(tsCol) >= timestamp_millis(lit(now() - r)))
    }

    val dims: Seq[(String, Column)] =
      if (query.groupByAll)
        batch.columns.filterNot(c => c == tsCol || valNames.contains(c))
          .sorted.map(d => d -> col(d)).toSeq
      else query.groupBy.map {
        case GroupDim(n)     => n -> dimResolve(n)
        case GroupExpr(n, e) => n -> Builders.dim(e, dimResolve)
      }

    val compiled = Builders.compile(tableFields, None,
      { case "_point" => lit(1.0); case n => col(n) }: String => Column,
      dimResolve, forStorage = true)
    require(compiled.shifts.isEmpty, "SHIFT cannot be materialized")

    val bucket = timestamp_millis(
      (floor(unix_millis(col(tsCol)) / lit(resolutionMillis.toDouble)) *
        resolutionMillis).cast("long")).as("_time")
    val keys = bucket +: dims.map { case (n, c) => c.as(n) }
    val partial = batch.groupBy(keys: _*).agg(compiled.aggs.head, compiled.aggs.tail: _*)

    val keyNames = "_time" +: dims.map(_._1)
    val merged = read() match {
      case None => partial
      case Some(existing) =>
        val unioned = existing.unionByName(partial, allowMissingColumns = true)
        val mergeCols = compiled.aggSpecs.map(s =>
          Builders.MergeOp(s.merge, col(s.alias)).as(s.alias))
        unioned.groupBy(keyNames.map(col): _*)
          .agg(mergeCols.head, mergeCols.tail: _*)
    }

    // retention: drop expired buckets on flush (row_store.go:378-382)
    val retained = config.retentionMillis match {
      case Some(r) => merged.filter(col("_time") >= timestamp_millis(lit(now() - r)))
      case None    => merged
    }

    // partitionby dims (cluster_follow.go:797-821's murmur3 partitioning
    // becomes a plain repartition on the declared dims) + key-sorted files
    // (the reference's optional sorted filestore, table.go:537-557) so
    // row-group stats prune reads
    val toWrite =
      if (config.partitionBy.nonEmpty) {
        val pCols = config.partitionBy.filter(retained.columns.contains).map(col)
        if (pCols.nonEmpty)
          retained.repartition(pCols: _*)
            .sortWithinPartitions(("_time" +: config.partitionBy
              .filter(retained.columns.contains)).map(col): _*)
        else retained
      } else retained

    val next = currentGen.getOrElse(-1L) + 1
    toWrite.write.mode(SaveMode.Overwrite).parquet(genPath(next))
    Files.createDirectories(Paths.get(storePath))
    Files.writeString(genMarker, next.toString)
    // best-effort cleanup of superseded generations (row_store.go:681-725)
    currentGen.foreach { g =>
      (0L until g).foreach { old =>
        try deleteRecursively(Paths.get(genPath(old)))
        catch { case _: Exception => () }
      }
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  /** Attach this table's materialization to a streaming point source. */
  def sink(stream: DataFrame, checkpointDir: String,
           trigger: org.apache.spark.sql.streaming.Trigger =
             org.apache.spark.sql.streaming.Trigger.ProcessingTime(1000)) = {
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) => mergeBatch(batch) }
      .start()
  }
}
