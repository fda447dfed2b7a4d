package graft

import org.apache.spark.sql.{DataFrame, Row}

/** Facade: zenodb-dialect SQL string → DataFrame over a catalog of tables.
  * `now` is injectable so relative ASOF/UNTIL are deterministic in tests.
  */
object Engine {
  def sql(catalog: Catalog, query: String,
          now: () => Long = () => System.currentTimeMillis()): DataFrame =
    new planner.Planner(catalog, now).plan(sqlx.Parser.parse(query))

  /** Execution stats returned alongside rows — the analogue of the
    * reference's common.QueryStats (common/common.go:57-64), which a cluster
    * query carries back even when some partitions miss the deadline
    * (cluster_query.go:317-330). Spark cancels the whole job group on
    * expiry, so completeness is boolean rather than per-partition:
    * `completed` = every task finished before the deadline; an expired
    * query yields zero rows with `completed = false` instead of silently
    * partial data.
    */
  final case class QueryStats(elapsedMs: Long, rows: Long, completed: Boolean)
  final case class QueryResult(rows: Array[Row], stats: QueryStats)

  /** Execute with a deadline — the reference runs every query under a
    * context deadline that the operators propagate (core/core_test.go
    * deadline tests; 1h cluster default, zenodb.go:39). Spark's analogue:
    * the collecting thread owns a dedicated job group with
    * interruptOnCancel, and expiry cancels the group, so running TASKS are
    * interrupted cluster-wide rather than orphaned. Never throws on expiry —
    * the result reports `stats.completed = false` (use [[sqlTimed]] for the
    * strict throw-on-expiry form).
    */
  def sqlWithStats(catalog: Catalog, query: String, timeoutMs: Long,
                   now: () => Long = () => System.currentTimeMillis()): QueryResult = {
    val df = sql(catalog, query, now)
    val sc = df.sparkSession.sparkContext
    val group = s"graft-deadline-${java.util.UUID.randomUUID()}"
    val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
    val t0 = System.nanoTime()
    def elapsedMs: Long = (System.nanoTime() - t0) / 1000000L
    try {
      val fut = pool.submit(new java.util.concurrent.Callable[Array[Row]] {
        def call(): Array[Row] = {
          sc.setJobGroup(group, query, interruptOnCancel = true)
          try df.collect()
          finally sc.clearJobGroup()
        }
      })
      try {
        val rows = fut.get(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
        QueryResult(rows, QueryStats(elapsedMs, rows.length.toLong, completed = true))
      } catch {
        case _: java.util.concurrent.TimeoutException =>
          sc.cancelJobGroup(group)
          fut.cancel(true)
          QueryResult(Array.empty[Row],
            QueryStats(elapsedMs, 0L, completed = false))
        case e: java.util.concurrent.ExecutionException =>
          throw e.getCause
      }
    } finally pool.shutdown()
  }

  /** Strict deadline form: expiry raises TimeoutException (the pre-stats
    * behavior; some callers prefer fail-fast to an empty result).
    */
  def sqlTimed(catalog: Catalog, query: String, timeoutMs: Long,
               now: () => Long = () => System.currentTimeMillis()): Array[Row] = {
    val res = sqlWithStats(catalog, query, timeoutMs, now)
    if (!res.stats.completed)
      throw new java.util.concurrent.TimeoutException(
        s"query exceeded ${timeoutMs}ms: $query")
    res.rows
  }
}
