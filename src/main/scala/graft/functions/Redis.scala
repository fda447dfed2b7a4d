package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Redis-style dimension functions (reference sql/sql.go:92-106:
  * HGET(hash, key), SISMEMBER(set, member), LUA(script, keys, args) via
  * getlantern/goexpr/redis). The reference queries a live redis with a
  * per-key TTL cache; a 1000-executor scan doing that would melt any redis,
  * so the Spark-native shape is a *snapshot*: install a hash/set once
  * (from any DataFrame — a parquet export, a JDBC read of the real redis,
  * a dim table), broadcast it, and probe with codegen'd [[MapLookup]] /
  * [[SetContains]]. Freshness becomes "re-install per batch/window", the
  * same trade Structured Streaming makes for any slowly-changing dim.
  *
  * LUA: the reference evaluates arbitrary redis-Lua against live keys.
  * Shipping a Lua interpreter into executors is out of scope for the
  * zero-dependency build, so LUA('name', keys, args) dispatches to a
  * *registered named script* implemented as a Column function — same
  * arity, same call sites, compute expressed in Catalyst instead of Lua.
  * Unregistered scripts fail loudly with this documented trade-off.
  */
object Redis {

  private val hashes =
    new java.util.concurrent.ConcurrentHashMap[String, Broadcast[StringMap]]()
  private val sets =
    new java.util.concurrent.ConcurrentHashMap[String, Broadcast[StringSet]]()
  private val scripts =
    new java.util.concurrent.ConcurrentHashMap[String, (Column, Column) => Column]()

  /** Snapshot a (key, value) DataFrame as hash `name`. First two columns
    * are key/value; duplicate keys keep the last row (redis HSET order).
    */
  def installHash(spark: SparkSession, name: String, kv: DataFrame): Unit = {
    val rows = kv.collect().map { r =>
      (UTF8String.fromString(if (r.isNullAt(0)) null else r.get(0).toString),
       UTF8String.fromString(if (r.isNullAt(1)) null else r.get(1).toString))
    }
    hashes.put(name, spark.sparkContext.broadcast(new StringMap(rows.toSeq)))
    installFunctions()
  }

  /** Snapshot the first column of `members` as set `name`. */
  def installSet(spark: SparkSession, name: String, members: DataFrame): Unit = {
    val rows = members.collect().flatMap { r =>
      if (r.isNullAt(0)) None else Some(UTF8String.fromString(r.get(0).toString))
    }
    sets.put(name, spark.sparkContext.broadcast(new StringSet(rows.toSeq)))
    installFunctions()
  }

  /** Register the Column function behind LUA('name', ARRAY(...), ARRAY(...)).
    * `f` receives the keys array column and the args array column.
    */
  def registerScript(name: String, f: (Column, Column) => Column): Unit = {
    scripts.put(name, f)
    installFunctions()
  }

  /** The hash/set/script *name* must be a literal — it selects which
    * broadcast to compile against, exactly like the reference resolves the
    * redis key at parse time (sql.go:92-95).
    */
  private def litName(raw: graft.sqlx.DExpr, fn: String): String = raw match {
    case graft.sqlx.DConst(s: String) => s
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal string name, got $other")
  }

  @volatile private var installed = false
  private def installFunctions(): Unit = if (!installed) synchronized {
    if (installed) return
    // redis keys are strings; integral dims coerce via a codegen'd cast,
    // matching how installHash/installSet stringify their snapshot keys
    graft.exprs.Builders.registerDimFnProviderRaw("HGET", (cols, raw) => {
      val name = litName(raw.head, "HGET")
      val bc = hashes.get(name)
      require(bc != null,
        s"HGET: no hash '$name' installed (Redis.installHash)")
      MapLookup(cols(1).cast(StringType), bc)
    })
    graft.exprs.Builders.registerDimFnProviderRaw("SISMEMBER", (cols, raw) => {
      val name = litName(raw.head, "SISMEMBER")
      val bc = sets.get(name)
      require(bc != null,
        s"SISMEMBER: no set '$name' installed (Redis.installSet)")
      SetContains(cols(1).cast(StringType), bc)
    })
    graft.exprs.Builders.registerDimFnProviderRaw("LUA", (cols, raw) => {
      val name = litName(raw.head, "LUA")
      val f = scripts.get(name)
      require(f != null,
        s"LUA: no script '$name' registered (Redis.registerScript) — " +
          "arbitrary redis-Lua is descoped; see Redis scaladoc")
      f(cols(1), cols(2))
    })
    installed = true
  }
}
