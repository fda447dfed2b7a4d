package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL operations for crawl-corpus curation — the C4/RefinedWeb URL-filter
  * stage: extract the host and registered domain from each document's
  * source URL, normalize away tracking noise, and drop documents from
  * blocklisted domains.
  *
  * Everything is pure `Column` composition (regex + array HOFs) inside
  * whole-stage codegen — map-only, zero shuffles at any corpus size — and
  * every regex stays in the Java-regex ∩ RE2 common subset (no
  * lookaround), so the exact expressions replay in a SQL oracle.
  */
object UrlOps {

  /** Lowercased host of a URL (authority minus userinfo/port); empty
    * string when the input doesn't parse as scheme://... A bracketed IPv6
    * authority (`http://[::1]:8080/x`) yields the bracketed literal
    * (`[::1]`, like `java.net.URI.getHost`) — the leading `\[...\]`
    * alternative must come before the label branch, whose `[^/:?#]+` would
    * otherwise stop at the first `:` inside the address and mis-parse the
    * host as `[`.
    */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?(\\[[^\\]]*\\]|[^/:?#]+)", 1))

  /** Explicit port of a URL as a string ("" when absent). Anchored through
    * end-of-authority so a malformed `host:80x` yields no port rather than
    * a truncated one.
    */
  def urlPort(url: Column): Column =
    regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?(?:\\[[^\\]]*\\]|[^/:?#]+)" +
        ":([0-9]+)(?:[/?#].*)?$", 1)

  /** Two-label public suffixes for the eTLD+1 heuristic. A full public
    * suffix list is a data file a deployment can swap in; this default
    * covers the common ccTLD second-level registries. Kept sorted so the
    * generated predicate is deterministic.
    */
  val DefaultTwoLabelSuffixes: Seq[String] = Seq(
    "ac.uk", "co.in", "co.jp", "co.kr", "co.nz", "co.uk", "co.za",
    "com.au", "com.br", "com.cn", "com.mx", "com.tr", "gov.uk", "ne.jp",
    "net.au", "or.jp", "org.au", "org.uk").sorted

  /** Registered domain (eTLD+1): the last two host labels, or the last
    * three when the last two form a known two-label public suffix
    * (`site.co.uk` → `site.co.uk`, `www.site.com` → `site.com`). Hosts
    * with fewer labels pass through unchanged.
    */
  def registeredDomain(host: Column,
                       twoLabelSuffixes: Seq[String] = DefaultTwoLabelSuffixes)
      : Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".", slice(labels, -2, 2))
    val lastThree = concat_ws(".", slice(labels, -3, 3))
    when(substring(host, 1, 1) === "[", host) // IPv6 literal: no labels
      .when(n <= 2, host)
      .when(lastTwo.isin(twoLabelSuffixes: _*), lastThree)
      .otherwise(lastTwo)
  }

  // ---- Public Suffix List resolution -----------------------------------
  //
  // The two-label heuristic above is the no-file default; real curation
  // runs load a PSL snapshot (a data file, not a code list — the same
  // pluggable pattern as the geo/ISP lookup providers) and resolve eTLD+1
  // with the full algorithm: longest-suffix match, `*.` wildcard rules,
  // `!` exception rules. `blog.github.io` then correctly stays its own
  // registered domain (github.io is a public suffix), where the heuristic
  // collapses it to github.io and misgroups URL-level dedup.

  /** Parse PSL-format lines (publicsuffix.org/list) into a resolver rule
    * set — `//` comments and blanks skipped, `*.`/`!` rules honored.
    */
  def parsePsl(lines: IterableOnce[String]): graft.functions.PslRules =
    graft.functions.PslResolver.parse(lines)

  /** Load a PSL snapshot file from disk (swap in a full
    * public_suffix_list.dat for production runs).
    */
  def loadPsl(path: String): graft.functions.PslRules = {
    import scala.jdk.CollectionConverters._
    parsePsl(java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).asScala)
  }

  /** Bundled snapshot subset (`graft/psl-snapshot.dat` on the classpath):
    * the common ccTLD registries, the highest-traffic private platform
    * suffixes, and the wildcard/exception registries.
    */
  lazy val defaultPsl: graft.functions.PslRules = {
    val in = getClass.getResourceAsStream("/graft/psl-snapshot.dat")
    require(in != null, "bundled PSL snapshot missing from classpath")
    try parsePsl(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** Registered domain (eTLD+1) of an extracted host under a Public Suffix
    * List — one broadcast of the rule set (memoized per session), one
    * hash-probe walk per row inside codegen
    * ([[graft.functions.RegisteredDomainPsl]]).
    */
  def registeredDomainPsl(host: Column,
                          rules: graft.functions.PslRules = defaultPsl)
      : Column =
    graft.functions.RegisteredDomainPsl(host, rules)

  /** Tracking query parameters stripped by [[normalizeUrl]]: the
    * cross-site-analytics keys every curation pipeline drops (two URLs
    * differing only in these are the same page — leaving them inflates
    * URL-level dedup misses).
    */
  val TrackingParamPattern: String =
    "^(utm_[a-z]+|gclid|fbclid|msclkid|mc_cid|mc_eid|ref)="

  /** Normalized URL: lowercase scheme+host, userinfo dropped, fragment
    * dropped, tracking params removed (other params kept in order),
    * trailing `?` dropped. NON-default ports survive — `http://h:8080/x`
    * and `http://h/x` are distinct origins and must not conflate in
    * URL-level dedup; only the scheme-default port (http:80 / https:443)
    * is dropped, since it IS the same origin as the portless URL.
    */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = urlHost(url)
    val port = urlPort(url)
    // raw text after the authority's port colon (empty when no colon, or a
    // bare trailing colon — RFC 3986 treats `h:` as `h`, so that stays
    // normalizable). A NON-empty tail that is not a pure number means the
    // URL is malformed (`h:80x`): pass it through untouched like every
    // other unparseable input instead of silently conflating it with the
    // clean portless URL in URL-level dedup.
    val rawPort = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?(?:\\[[^\\]]*\\]|[^/:?#]+)" +
        ":([^/?#]*)", 1)
    val malformedPort = rawPort =!= "" && port === ""
    val defaultPort =
      when(scheme === "http", "80").when(scheme === "https", "443")
        .otherwise("")
    val portPart = when(port === "" || port === defaultPort, lit(""))
      .otherwise(concat(lit(":"), port))
    val pathQ = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val path = regexp_extract(pathQ, "^([^?]*)", 1)
    val query = regexp_extract(pathQ, "^[^?]*\\?(.*)$", 1)
    val kept = filter(split(query, "&"),
      p => !(p.rlike(TrackingParamPattern)) && p =!= "")
    val q2 = concat_ws("&", kept)
    when(host === "" || malformedPort, url) // unparseable: pass through untouched
      .otherwise(concat(scheme, lit("://"), host, portPart, path,
        when(q2 === "", lit("")).otherwise(concat(lit("?"), q2))))
  }

  /** Drop every row whose URL's registered domain is in `blocked` — the
    * blocklist filter. The list rides in the plan (an `isin` predicate) up
    * to a few thousand entries; bigger lists should broadcast-anti-join a
    * domain table instead (`df.join(broadcast(bad), ..., "left_anti")`).
    * Map-only either way.
    */
  def domainFilter(df: DataFrame, urlCol: Column,
                   blocked: Seq[String],
                   twoLabelSuffixes: Seq[String] = DefaultTwoLabelSuffixes)
      : DataFrame =
    df.filter(!registeredDomain(urlHost(urlCol), twoLabelSuffixes)
      .isin(blocked: _*))

  /** [[domainFilter]] resolving through the Public Suffix List: under the
    * heuristic, a blocklist entry like `spam.github.io` can never match
    * (every `*.github.io` host collapses to `github.io`), so blocked
    * platform subdomains slip through — the PSL resolver keeps each
    * subdomain its own registered domain and the entry fires. Same
    * map-only shape.
    */
  def domainFilterPsl(df: DataFrame, urlCol: Column, blocked: Seq[String],
                      rules: graft.functions.PslRules = defaultPsl)
      : DataFrame =
    df.filter(!registeredDomainPsl(urlHost(urlCol), rules)
      .isin(blocked: _*))
}
