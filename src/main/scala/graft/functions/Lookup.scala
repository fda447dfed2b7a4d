package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Broadcast lookup primitives behind the reference's external-data dim
  * functions (geo/ISP/redis — /root/reference/sql/sql.go:81-106,
  * zenodb.go:256-276). The reference resolves these per-row against a local
  * MaxMind database or a redis connection; the Spark-native shape is a
  * snapshot broadcast to every executor once, probed by a codegen'd
  * expression inside whole-stage codegen — no per-row RPC, no UDF
  * serialization boundary, no shuffle.
  *
  * Scale: a full GeoLite2-class range DB is ~3M ranges ≈ 100 MB as three
  * primitive/UTF8String arrays — comfortably within executor broadcast
  * budget, shipped once per executor (not per task). Lookups are O(log n)
  * branch-free-ish binary searches on a primitive long array.
  */
object Lookup {

  /** Dotted-quad IPv4 → unsigned-32 value as a long; -1 when malformed.
    * Static so generated code can call it without boxing.
    */
  def aton(s: UTF8String): Long = {
    if (s == null) return -1L
    val b = s.getBytes
    var value = 0L; var octet = 0L; var octets = 0; var digits = 0
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c >= '0' && c <= '9') {
        octet = octet * 10 + (c - '0'); digits += 1
        if (octet > 255 || digits > 3) return -1L
      } else if (c == '.') {
        if (digits == 0 || octets == 3) return -1L
        value = (value << 8) | octet; octet = 0L; digits = 0; octets += 1
      } else return -1L
      i += 1
    }
    if (digits == 0 || octets != 3) return -1L
    (value << 8) | octet
  }
}

/** Immutable sorted (start,end]-inclusive range → string value table.
  * Ranges must be non-overlapping; keys outside every range map to null.
  */
final class RangeTable(val starts: Array[Long], val ends: Array[Long],
                       val values: Array[UTF8String]) extends Serializable {
  require(starts.length == ends.length && ends.length == values.length)

  /** Largest start <= key, then bounds-check against its end. */
  def lookup(key: Long): UTF8String = {
    var lo = 0; var hi = starts.length - 1; var res = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (starts(mid) <= key) { res = mid; lo = mid + 1 } else hi = mid - 1
    }
    if (res >= 0 && key <= ends(res)) values(res) else null
  }
}

object RangeTable {
  def fromRows(rows: Seq[(Long, Long, String)]): RangeTable = {
    val sorted = rows.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq(a, b) => require(a._2 < b._1,
        s"overlapping ranges: [${a._1},${a._2}] vs [${b._1},${b._2}]")
      case _ => ()
    }
    new RangeTable(sorted.map(_._1).toArray, sorted.map(_._2).toArray,
      sorted.map(r => if (r._3 == null) null
                      else UTF8String.fromString(r._3)).toArray)
  }
}

/** Hash snapshot for HGET-style lookups. */
final class StringMap(pairs: Iterable[(UTF8String, UTF8String)])
    extends Serializable {
  private val m = {
    val h = new java.util.HashMap[UTF8String, UTF8String](pairs.size * 2)
    pairs.foreach { case (k, v) => h.put(k, v) }
    h
  }
  def lookup(key: UTF8String): UTF8String = m.get(key)
}

/** Set snapshot for SISMEMBER-style membership. */
final class StringSet(members: Iterable[UTF8String]) extends Serializable {
  private val s = {
    val h = new java.util.HashSet[UTF8String](members.size * 2)
    members.foreach(h.add)
    h
  }
  def contains(key: UTF8String): Boolean = s.contains(key)
}

private[functions] trait BroadcastProbe { self: UnaryExpression =>
  /** Hoist `broadcast.value` into a lazily-initialized instance field so the
    * per-row generated code probes the deserialized structure directly.
    */
  protected def probeRef(ctx: CodegenContext, bc: Broadcast[_],
                         javaClass: String): String = {
    val bcRef = ctx.addReferenceObj("broadcastTable", bc,
      "org.apache.spark.broadcast.Broadcast")
    ctx.addMutableState(javaClass, "lookupTable",
      v => s"$v = ($javaClass) $bcRef.value();", forceInline = true)
  }
}

/** value = table.lookup(key); key may be an integral IP or a dotted-quad
  * string (parsed with [[Lookup.aton]]; malformed → null, matching the
  * reference's nil result for unresolvable IPs).
  */
case class RangeLookup(child: Expression, table: Broadcast[RangeTable])
    extends UnaryExpression with BroadcastProbe {
  override def prettyName: String = "range_lookup"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"range_lookup expects an integral or dotted-quad key, got ${other.sql}")
  }

  private def toKey(k: Any): Long = k match {
    case l: Long       => l
    case i: Int        => i.toLong
    case s: UTF8String => Lookup.aton(s)
  }

  override def nullSafeEval(k: Any): Any = {
    val key = toKey(k)
    if (key < 0) null else table.value.lookup(key)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = probeRef(ctx, table, "graft.functions.RangeTable")
    nullSafeCodeGen(ctx, ev, k => {
      val key = ctx.freshName("key")
      val keyExpr = child.dataType match {
        case StringType => s"graft.functions.Lookup.aton($k)"
        case _          => s"(long) $k"
      }
      s"""
         |final long $key = $keyExpr;
         |${ev.value} = ($key < 0L) ? null : $tbl.lookup($key);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): RangeLookup =
    copy(child = c)
}

object RangeLookup {
  def apply(key: Column, table: Broadcast[RangeTable]): Column =
    ColumnBridge.column(RangeLookup(ColumnBridge.expression(key), table))
}

/** value = map.get(key) — the broadcast analogue of redis HGET over a
  * snapshot (reference resolves via getlantern/goexpr/redis with a per-key
  * TTL cache; a broadcast snapshot is the shape that scales to 1000
  * executors without a network hop per row).
  */
case class MapLookup(child: Expression, table: Broadcast[StringMap])
    extends UnaryExpression with BroadcastProbe {
  override def prettyName: String = "map_lookup"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"map_lookup expects a string key, got ${other.sql}")
  }

  override def nullSafeEval(k: Any): Any =
    table.value.lookup(k.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = probeRef(ctx, table, "graft.functions.StringMap")
    nullSafeCodeGen(ctx, ev, k => {
      s"""
         |${ev.value} = $tbl.lookup($k);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MapLookup =
    copy(child = c)
}

object MapLookup {
  def apply(key: Column, table: Broadcast[StringMap]): Column =
    ColumnBridge.column(MapLookup(ColumnBridge.expression(key), table))
}

/** value = set.contains(key); a null key is simply not a member (false, not
  * null — membership is two-valued like the engine's IN, Builders DIn).
  */
case class SetContains(child: Expression, table: Broadcast[StringSet])
    extends UnaryExpression with BroadcastProbe {
  override def prettyName: String = "set_contains"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"set_contains expects a string key, got ${other.sql}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val k = child.eval(input)
    k != null && table.value.contains(k.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = probeRef(ctx, table, "graft.functions.StringSet")
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
${c.code}
final boolean ${ev.value} = !${c.isNull} && $tbl.contains(${c.value});
""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): SetContains =
    copy(child = c)
}

object SetContains {
  def apply(key: Column, table: Broadcast[StringSet]): Column =
    ColumnBridge.column(SetContains(ColumnBridge.expression(key), table))
}
