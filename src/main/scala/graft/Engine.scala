package graft

import org.apache.spark.sql.DataFrame

/** Facade: zenodb-dialect SQL string → DataFrame over a catalog of tables.
  * `now` is injectable so relative ASOF/UNTIL are deterministic in tests.
  */
object Engine {
  def sql(catalog: Catalog, query: String,
          now: () => Long = () => System.currentTimeMillis()): DataFrame =
    new planner.Planner(catalog, now).plan(sqlx.Parser.parse(query))
}
