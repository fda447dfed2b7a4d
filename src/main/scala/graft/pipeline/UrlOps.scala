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
    * string when the input doesn't parse as scheme://...
    */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1))

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
    when(n <= 2, host)
      .when(lastTwo.isin(twoLabelSuffixes: _*), lastThree)
      .otherwise(lastTwo)
  }

  /** Tracking query parameters stripped by [[normalizeUrl]]: the
    * cross-site-analytics keys every curation pipeline drops (two URLs
    * differing only in these are the same page — leaving them inflates
    * URL-level dedup misses).
    */
  val TrackingParamPattern: String =
    "^(utm_[a-z]+|gclid|fbclid|msclkid|mc_cid|mc_eid|ref)="

  /** Normalized URL: lowercase scheme+host, fragment dropped, tracking
    * params removed (other params kept in order), trailing `?` dropped.
    */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = urlHost(url)
    val pathQ = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val path = regexp_extract(pathQ, "^([^?]*)", 1)
    val query = regexp_extract(pathQ, "^[^?]*\\?(.*)$", 1)
    val kept = filter(split(query, "&"),
      p => !(p.rlike(TrackingParamPattern)) && p =!= "")
    val q2 = concat_ws("&", kept)
    when(host === "", url) // unparseable: pass through untouched
      .otherwise(concat(scheme, lit("://"), host, path,
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
}
