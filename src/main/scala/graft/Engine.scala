package graft

import org.apache.spark.sql.{DataFrame, Row}

/** Facade: zenodb-dialect SQL string → DataFrame over a catalog of tables.
  * `now` is injectable so relative ASOF/UNTIL are deterministic in tests.
  */
object Engine {
  def sql(catalog: Catalog, query: String,
          now: () => Long = () => System.currentTimeMillis()): DataFrame =
    new planner.Planner(catalog, now).plan(sqlx.Parser.parse(query))

  /** Execute with a deadline — the reference runs every query under a
    * context deadline that the operators propagate (core/core_test.go
    * deadline tests; 1h cluster default, zenodb.go:39). Spark's analogue:
    * the collecting thread owns a dedicated job group with
    * interruptOnCancel, and expiry cancels the group, so running TASKS are
    * interrupted cluster-wide rather than orphaned.
    */
  def sqlTimed(catalog: Catalog, query: String, timeoutMs: Long,
               now: () => Long = () => System.currentTimeMillis()): Array[Row] = {
    val df = sql(catalog, query, now)
    val sc = df.sparkSession.sparkContext
    val group = s"graft-deadline-${java.util.UUID.randomUUID()}"
    val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
    try {
      val fut = pool.submit(new java.util.concurrent.Callable[Array[Row]] {
        def call(): Array[Row] = {
          sc.setJobGroup(group, query, interruptOnCancel = true)
          try df.collect()
          finally sc.clearJobGroup()
        }
      })
      try fut.get(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          sc.cancelJobGroup(group)
          fut.cancel(true)
          throw new java.util.concurrent.TimeoutException(
            s"query exceeded ${timeoutMs}ms: $query")
        case e: java.util.concurrent.ExecutionException =>
          throw e.getCause
      }
    } finally pool.shutdown()
  }
}
