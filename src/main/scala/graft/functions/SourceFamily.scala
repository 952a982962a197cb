package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Source-FAMILY normalization for provenance operators.
  *
  * [[graft.dedup.Dedup.sourceOverlap]]'s scale contract says web-scale
  * callers must "group sources into families first" — this is that
  * grouping as an operator, not caller homework. A source identifier
  * rolls up to its family:
  *
  *  - URL / URI sources → the REGISTERED DOMAIN of the host: userinfo,
  *    port, path and query stripped, then the last two labels — or the
  *    last three when the second-to-last label is a multi-part public
  *    suffix (`co`/`com`/`net`/`org`/`ac`/`gov`/`edu`) under a
  *    two-letter ccTLD, so `www.bbc.co.uk` → `bbc.co.uk` while
  *    `cdn3.mirror.example.com` → `example.com`.
  *  - Plain (non-URL) sources → ONE trailing shard suffix stripped: a
  *    MANDATORY `-`/`_`/`.` separator plus digits (`crawl-03` →
  *    `crawl`, `shard_7` → `shard`). The separator is required so the
  *    mapping is a congruence: a base id that itself ends in digits
  *    keeps them (`crawl7` → `crawl7`) and its shards join it
  *    (`crawl7_1` → `crawl7`) — an optional separator would instead
  *    split `crawl7` (→ `crawl`) away from its own shards and merge
  *    unrelated `web1`/`web17` into `web`.
  *
  * Everything is lowercased and trimmed first. The whole extractor is
  * built from codegen'd string functions (rlike / regexp_extract /
  * split / get / slice) — no UDF, so it rides inside whole-stage
  * codegen next to the scan, and composing it in front of
  * [[graft.dedup.Dedup.sourceOverlap]] or
  * [[graft.text.CorpusOps.sourceKlDivergence]] changes the aggregation
  * key only: the matrix becomes O(F²) in the FAMILY universe instead
  * of O(S²) in the raw-source universe, which is the entire point.
  *
  * Public-suffix nuance stated loudly: the multi-part-suffix list is a
  * deliberate 7-entry core, not the full Mozilla public-suffix list —
  * families under exotic suffixes (`foo.github.io`, `bar.ltd.uk`)
  * roll up one label short. For curation diagnostics that coarsening
  * is benign (it only ever MERGES families, never splits one), and the
  * list is a single place to widen.
  */
object SourceFamily {

  private val multiPartSuffixes = Seq("co", "com", "net", "org", "ac", "gov", "edu")

  /** The family of one source identifier — see object doc for rules. */
  def familyOf(source: Column): Column = {
    val s = lower(trim(source))
    val isUrl = s.rlike("^[a-z][a-z0-9+.-]*://")
    val host = regexp_extract(s, "^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1)
    val labels = split(host, "\\.")
    val n = size(labels)
    // get() is 0-based and null-safe out of bounds (ANSI-safe in the
    // CaseWhen conditions below, where element_at would throw on n < 2)
    val sld = get(labels, n - 2)
    val tld = get(labels, n - 1)
    val take3 = (n >= 3) && sld.isin(multiPartSuffixes: _*) && (length(tld) === 2)
    when(isUrl,
      when(take3, concat_ws(".", slice(labels, n - 2, lit(3))))
        .when(n >= 2, concat_ws(".", slice(labels, n - 1, lit(2))))
        .otherwise(host))
      .otherwise(regexp_replace(s, "[-_.][0-9]+$", ""))
  }

  /** URL CANONICALIZATION — the crawl-dedup first step: two fetches of
    * the same page must collide on one key before any content dedup
    * runs. For a URL input, the canonical form is
    *   lowercase scheme "://" lowercase host (userinfo stripped,
    *   default port :80/:443 stripped) + path ("/" when empty)
    *   + "?" + sorted query params with tracking params removed
    *   (utm_*, fbclid, gclid — case-insensitive) — fragment always
    *   dropped. `ref` is NOT stripped: it is widely semantic
    *   (?ref=main vs ?ref=dev), and a false merge in a dedup key is
    *   data loss.
    * Non-URL inputs pass through trimmed. Pure codegen'd string
    * functions + array HOFs — no UDF, rides in the scan stage.
    *
    * Deliberately NOT done (stated, not hidden): percent-decoding and
    * path-segment normalization (`/a/../b`) — both can CHANGE which
    * resource a URL names on servers that treat them literally;
    * canonicalization here only removes parts with defined
    * don't-affect-the-resource semantics.
    */
  def canonicalizeUrl(url: Column): Column = {
    val s = trim(url)
    val isUrl = s.rlike("^[A-Za-z][A-Za-z0-9+.-]*://")
    val scheme = lower(regexp_extract(s, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(s,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/?#]+)", 1))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val rawPath = regexp_extract(s,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    // query anchored at the FIRST '?' of the pre-fragment prefix: the
    // greedy "^[^#]*\?" would anchor at the LAST '?', so a legal
    // literal '?' inside a query value (RFC 3986 allows it —
    // 'https://a/p?q=ab?cd') would drop everything between the two
    // '?'s and falsely merge with the distinct 'https://a/p?cd' —
    // silent data loss in a dedup key. The [^#?] prefix class both
    // keeps fragment '?'s out ('https://a/#/x?p=2' still has no
    // query) and stops the prefix at the first real '?'.
    val query = regexp_extract(s, "^[^#?]*\\?([^#]*)", 1)
    // tracking-param match is case-insensitive (hosts are folded, so a
    // surviving 'UTM_SOURCE=' would break key collision); 'ref' is
    // deliberately NOT stripped — unlike utm_*/fbclid/gclid it is
    // widely a semantic parameter (?ref=main vs ?ref=dev name
    // different resources), and a false merge in a dedup key is data
    // loss
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike("(?i)^(utm_[^=]*|fbclid|gclid)=")))
    val qs = when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
      .otherwise(lit(""))
    when(isUrl, concat(scheme, lit("://"), host, path, qs)).otherwise(s)
  }

  /** SURT key (Sort-friendly URI Reordering Transform) — the sort
    * order every web-archive index (CDX) uses: all of one site's pages
    * become ONE contiguous key range, so a range scan over the sorted
    * index answers "everything under example.com/" without a filter
    * over the whole archive. Composed ON TOP of [[canonicalizeUrl]]
    * (same collision semantics — two fetches of one page must map to
    * one key here too): the canonical host loses a single leading
    * `www.`, its labels reverse comma-joined (`com,example`), then
    * `)` + canonical path + canonical query. Scheme is dropped — an
    * archive index treats http/https fetches of a page as one range
    * (the digest distinguishes content). Non-URL inputs pass through
    * canonicalizeUrl's trim untouched. Pure codegen'd string/array
    * functions, scan-stage.
    */
  def surtKey(url: Column): Column = {
    val c = canonicalizeUrl(url)
    val isUrl = c.rlike("^[a-z][a-z0-9+.-]*://")
    val hostPort = regexp_extract(c, "^[a-z][a-z0-9+.-]*://([^/]+)", 1)
    val rest = regexp_extract(c, "^[a-z][a-z0-9+.-]*://[^/]+(/.*)$", 1)
    // a surviving non-default port belongs AFTER the reversed labels
    // (SURT `com,example:8080)`), not inside the last label — embedded
    // it would sort the site's keys into a foreign part of the range
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val host = regexp_replace(hostPort, ":[0-9]+$", "")
    val bare = regexp_replace(host, "^www\\.", "")
    val rev = array_join(reverse(split(bare, "\\.")), ",")
    val withPort = when(port =!= "", concat(rev, lit(":"), port))
      .otherwise(rev)
    when(isUrl, concat(withPort, lit(")"), rest)).otherwise(c)
  }

  /** The bare HOST of a URL (lowercased, credentials and port
    * stripped) — the politeness grain below [[familyOf]]'s registered
    * domain: `blog1.example.com` and `blog2.example.com` are one
    * budget FAMILY but two fetch TARGETS, and per-host caps
    * ([[graft.graph.CrawlOps.crawlWorklistPerHost]]) key on this.
    * Non-URL input yields '' (never a fake host).
    */
  def hostOf(url: Column): Column =
    regexp_extract(lower(trim(url)),
      "^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1)

  /** DuckDB rendering of [[hostOf]] — same regex, same fold. */
  def hostOfSql(e: String): String =
    s"regexp_extract(lower(trim($e)), " +
      s"'^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1)"

  /** SQL (DuckDB-compatible) rendering of [[familyOf]] over a source
    * expression `e` — the oracle-side twin, kept beside the Column form
    * so the two cannot drift. 1-based list indexing; same regexes.
    */
  def familyOfSql(e: String): String = {
    val suffixes = multiPartSuffixes.map(s => s"'$s'").mkString(", ")
    s"""CASE WHEN regexp_matches(lower(trim($e)), '^[a-z][a-z0-9+.-]*://') THEN
          (SELECT CASE
             WHEN len(l) >= 3 AND l[len(l) - 1] IN ($suffixes)
                  AND length(l[len(l)]) = 2
               THEN array_to_string(l[len(l) - 2 : len(l)], '.')
             WHEN len(l) >= 2
               THEN array_to_string(l[len(l) - 1 : len(l)], '.')
             ELSE h END
           FROM (SELECT regexp_extract(lower(trim($e)),
                   '^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1) AS h,
                 string_split(regexp_extract(lower(trim($e)),
                   '^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1), '.') AS l))
        ELSE regexp_replace(lower(trim($e)), '[-_.][0-9]+$$', '') END"""
  }
}
