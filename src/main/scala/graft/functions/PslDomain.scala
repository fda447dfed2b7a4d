package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parsed Public Suffix List rules (publicsuffix.org/list format), shipped
  * to executors as ONE broadcast: `normal` holds plain rules ("co.uk"),
  * `wildcard` holds the base of `*.`-rules ("ck" for "*.ck"), `exception`
  * holds `!`-rules minus the bang ("www.ck" for "!www.ck"). `maxLabels` is
  * the longest rule's label count, bounding the suffix walk per host.
  */
final class PslRules(val normal: java.util.HashSet[String],
                     val wildcard: java.util.HashSet[String],
                     val exception: java.util.HashSet[String],
                     val maxLabels: Int) extends Serializable {
  // VALUE equality (the sets compare by content): the broadcast memo keys
  // on the rules, and per-query `loadPsl(path)` calls yield fresh
  // instances — identity keying would accrete one broadcast per call for
  // the JVM lifetime. Exact set comparison, not a content hash: a hash
  // collision would silently alias two different rule sets to one
  // broadcast and mis-resolve domains.
  override def equals(o: Any): Boolean = o match {
    case r: PslRules => maxLabels == r.maxLabels && normal == r.normal &&
      wildcard == r.wildcard && exception == r.exception
    case _ => false
  }
  override def hashCode: Int =
    ((normal.hashCode * 31 + wildcard.hashCode) * 31 +
      exception.hashCode) * 31 + maxLabels
}

/** Registered domain (eTLD+1) of an already-extracted lowercase host,
  * resolved against a broadcast Public Suffix List — the PSL algorithm
  * (longest-match with wildcard and exception rules), not the two-label
  * heuristic: `blog.github.io` stays `blog.github.io` because `github.io`
  * is a public suffix, `a.b.ck` resolves under the `*.ck` wildcard, and
  * `x.www.ck` collapses to `www.ck` under the `!www.ck` exception.
  *
  * One JVM hash-set probe per candidate suffix (≤ maxLabels+1 per row),
  * inside whole-stage codegen; only the broadcast handle rides in the task
  * binary. Hosts that ARE a public suffix pass through unchanged, as do
  * bracketed IPv6 literals and the empty string — matching the heuristic's
  * contract so the two resolvers are drop-in interchangeable.
  */
case class RegisteredDomainPsl(child: Expression, rules: Broadcast[PslRules])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"registered_domain_psl expects a string host column, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    PslResolver.registeredDomain(input.asInstanceOf[UTF8String], rules.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bcRef = ctx.addReferenceObj("pslBc", rules,
        "org.apache.spark.broadcast.Broadcast")
      val rulesRef = ctx.addMutableState("graft.functions.PslRules", "pslRules",
        v => s"$v = (graft.functions.PslRules) $bcRef.value();")
      s"${ev.value} = graft.functions.PslResolver.registeredDomain($c, $rulesRef);"
    })

  override protected def withNewChildInternal(newChild: Expression)
      : RegisteredDomainPsl = copy(child = newChild)
}

object RegisteredDomainPsl {
  // one broadcast per (application, rule-set CONTENT): PslRules has value
  // equality, so a session re-parsing the same PSL file per query reuses
  // one broadcast instead of accreting one per call. Entries of dead
  // applications are evicted on the next apply — the memo is bounded by
  // the live app's distinct rule-set contents.
  private val bcMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, PslRules), Broadcast[PslRules]]()

  /** Visible for the broadcast-sharing test. */
  private[graft] def memoSize: Int = bcMemo.size

  def apply(host: Column, rules: PslRules): Column = {
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    val appId = sc.applicationId
    bcMemo.keySet.removeIf(_._1 != appId)
    val bc = bcMemo.computeIfAbsent((appId, rules),
      _ => sc.broadcast(rules))
    ColumnBridge.column(
      RegisteredDomainPsl(ColumnBridge.expression(host), bc))
  }
}

/** The per-row PSL walk behind [[RegisteredDomainPsl]] — static so
  * generated code can call it without captured state.
  */
object PslResolver {

  /** Parse PSL-format lines: `//` comments and blanks skipped, rules read
    * up to the first whitespace (the upstream file annotates some entries),
    * lowercased. The implicit default rule `*` (unlisted TLD → last label
    * is the public suffix) is part of the algorithm, not the data.
    */
  def parse(lines: IterableOnce[String]): PslRules = {
    val normal = new java.util.HashSet[String]()
    val wildcard = new java.util.HashSet[String]()
    val exception = new java.util.HashSet[String]()
    var maxLabels = 1
    lines.iterator.foreach { raw =>
      val line = raw.trim.takeWhile(!_.isWhitespace)
      if (line.nonEmpty && !line.startsWith("//")) {
        val rule = line.toLowerCase(java.util.Locale.ROOT)
        val labels = rule.count(_ == '.') + 1
        if (rule.startsWith("!")) exception.add(rule.substring(1))
        else if (rule.startsWith("*.")) {
          wildcard.add(rule.substring(2))
          maxLabels = math.max(maxLabels, labels)
        } else {
          normal.add(rule)
          maxLabels = math.max(maxLabels, labels)
        }
      }
    }
    new PslRules(normal, wildcard, exception, maxLabels)
  }

  /** The PSL algorithm over a lowercase host. Exception rules prevail, then
    * the longest matching rule (a `*.X` wildcard matches any `label.X`
    * suffix), then the default rule `*`. The registered domain is the
    * public suffix plus one label; a host with no label to spare (it IS a
    * public suffix), a bracketed IPv6 literal, and the empty string pass
    * through unchanged.
    */
  def registeredDomain(host: UTF8String, rules: PslRules): UTF8String = {
    val h = host.toString
    if (h.isEmpty || h.charAt(0) == '[') return host
    val labels = h.split('.')
    val n = labels.length
    // suffix string of the last l labels (l >= 1)
    def suffix(l: Int): String = {
      val sb = new java.lang.StringBuilder()
      var i = n - l
      while (i < n) {
        if (i > n - l) sb.append('.')
        sb.append(labels(i))
        i += 1
      }
      sb.toString
    }
    // exception rules win outright: the matched rule IS the registered
    // domain (its public suffix is the rule minus the leftmost label)
    var l = math.min(n, rules.maxLabels + 1)
    while (l >= 1) {
      if (rules.exception.contains(suffix(l)))
        return UTF8String.fromString(suffix(l))
      l -= 1
    }
    // longest matching rule; default `*` → last label
    var ps = 1
    l = math.min(n, rules.maxLabels + 1)
    var found = false
    while (l >= 1 && !found) {
      if (rules.normal.contains(suffix(l))) { ps = l; found = true }
      else if (l >= 2 && rules.wildcard.contains(suffix(l - 1))) {
        ps = l; found = true
      } else l -= 1
    }
    if (n <= ps) host else UTF8String.fromString(suffix(ps + 1))
  }
}
