package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization & URL-level dedup (SURVEY.md §2.6 extension) —
  * the first dedup pass of every web-scale curation pipeline (CCNet /
  * C4 / RefinedWeb): before any content hashing, collapse crawl records
  * that are the same page fetched under cosmetically different URLs
  * (scheme/host case, default ports, fragments, tracking parameters,
  * trailing slashes, query-parameter order).
  *
  * Everything is a pure `Column` expression over Spark's native string
  * kernels (`regexp_extract`, `split`, the `filter`/`transform`
  * higher-order functions) — map-only, codegen-resident, no UDFs; the
  * only shuffle in the whole family is [[dedupByUrl]]'s one exchange
  * keyed by the canonical URL.
  *
  * Scope, documented rather than discovered: absolute `scheme://` URLs
  * only (anything else canonicalizes to NULL — a crawl record without
  * an absolute URL is malformed upstream); IPv6 bracket hosts and
  * internationalized domain names pass through verbatim (no punycode
  * table on board); "registrable domain" is the last-two-labels
  * heuristic, not the Public Suffix List (`co.uk`-style two-level TLDs
  * group one label too high — callers needing PSL precision join their
  * own suffix table against [[urlHost]]).
  */
object Urls {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val AuthorityRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val PathQueryRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"

  /** Query parameters dropped by [[canonicalizeUrl]]: analytics
    * attribution keys that never change page content. Anchored prefix
    * match on `key=` — a bare valueless key survives (rare, and
    * dropping it would need lookahead, which RE2-class engines used by
    * cross-engine mirrors don't have). */
  private val TrackingRe = "^(utm_[^=]*|gclid|fbclid|ref)="

  /** Lowercased host of an absolute URL, with userinfo and port
    * stripped; NULL when the input has no `scheme://` prefix. */
  def urlHost(u: Column): Column = {
    val auth = regexp_extract(u, AuthorityRe, 1)
    // after the LAST '@' (userinfo may itself contain '@' percent-variants)
    val hostport = regexp_extract(auth, "([^@]*)$", 1)
    val host = lower(regexp_extract(hostport, "^([^:]*)", 1))
    when(regexp_extract(u, SchemeRe, 1) === "" || host === "",
      lit(null).cast("string")).otherwise(host)
  }

  /** Last-two-labels registrable-domain heuristic over [[urlHost]]
    * (`a.b.example.com` → `example.com`); single-label hosts pass
    * through. See the object scaladoc for the PSL caveat. */
  def registrableDomain(u: Column): Column = {
    val host = urlHost(u)
    val twoLabels = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    when(host.isNull, lit(null).cast("string"))
      .otherwise(when(twoLabels === "", host).otherwise(twoLabels))
  }

  /** Canonical form of an absolute URL, NULL for anything else:
    *
    *   - scheme and host lowercased, userinfo dropped;
    *   - default ports dropped (`http:80`, `https:443`), others kept;
    *   - path: trailing slashes stripped, empty path becomes `/`;
    *   - query: tracking parameters ([[TrackingRe]]) and empty
    *     fragments dropped, survivors SORTED (byte order) and rejoined —
    *     parameter order never changes page identity; an emptied query
    *     loses its `?`;
    *   - fragment dropped (client-side only, never sent to the server).
    *
    * Percent-encoding is preserved verbatim (normalizing it safely
    * requires a reserved-character table; `%2F` vs `/` is not an
    * equivalence). Two URLs canonicalizing equal are the same resource
    * under RFC 3986 §6 comparison minus the documented approximations.
    */
  def canonicalizeUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u, SchemeRe, 1))
    val auth = regexp_extract(u, AuthorityRe, 1)
    val hostport = regexp_extract(auth, "([^@]*)$", 1)
    val host = lower(regexp_extract(hostport, "^([^:]*)", 1))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val pq = regexp_extract(u, PathQueryRe, 1)
    val rawPath = regexp_extract(pq, "^([^?]*)", 1)
    val rawQuery = regexp_extract(pq, "\\?(.*)$", 1)
    val strippedPath = regexp_replace(rawPath, "/+$", "")
    val path = when(strippedPath === "", lit("/")).otherwise(strippedPath)
    val params = filter(split(rawQuery, "&"),
      p => p =!= "" && !p.rlike(TrackingRe))
    val cleanQuery = array_join(array_sort(params), "&")
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val queryPart = when(cleanQuery === "", lit(""))
      .otherwise(concat(lit("?"), cleanQuery))
    when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portPart, path, queryPart))
  }

  /** Host suffix-label chains of an absolute URL's host, shortest first:
    * `a.b.ex.org` → `[org, ex.org, b.ex.org, a.b.ex.org]`. The matching
    * unit for blocklists — label-boundary suffixes, never substrings
    * (`ex.org` must block `a.ex.org` but not `index.org`). NULL for
    * non-absolute inputs. */
  def hostSuffixes(u: Column): Column = {
    val labels = split(urlHost(u), "\\.")
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, -i, i), "."))
  }

  /** Keep only rows whose URL host is NOT a blocked domain nor any
    * subdomain of one. The blocklist embeds as a literal array and the
    * test is one `arrays_overlap` over the host's suffix chain — map-only
    * and codegen-resident, O(labels) per row regardless of list size
    * (real blocklists run 10⁴–10⁶ entries; a CASE/rlike chain would blow
    * codegen, and substring matching would over-block). Rows with
    * non-absolute URLs are kept — filtering malformed records is
    * [[dedupByUrl]]'s / the validator layer's decision, not a blocklist
    * hit. For blocklists past broadcast-literal size, join
    * `explode(hostSuffixes(u))` against a blocklist table instead. */
  def filterBlockedDomains(df: DataFrame, urlCol: String,
                           blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "empty blocklist: nothing to filter")
    val hit = arrays_overlap(hostSuffixes(col(urlCol)),
      typedLit(blocked.map(_.toLowerCase)))
    df.filter(!coalesce(hit, lit(false)))
  }

  /** URL-level exact dedup: keep, per canonical URL, the single row with
    * the smallest `idCol` (deterministic "first fetch wins" — same
    * nesting property as [[Sampling.capPerStratum]]: the survivor set is
    * stable under corpus growth that only appends larger ids). Rows
    * whose URL does not canonicalize (NULL) drop — they are malformed
    * crawl records, not deduplicable resources. The canonical form is
    * appended as `canonCol`.
    *
    * Scale shape: one exchange keyed by the canonical URL. The
    * `row_number ≤ 1` compiles to `WindowGroupLimit`, so every map task
    * pre-prunes to ONE row per canonical URL before the shuffle — a URL
    * crawled a million times ships at most #map-partitions rows, never
    * a million (the same skew bound as the hot-bucket guards in
    * [[Dedup]]). Canonical URLs are near-unique keys, so the exchange
    * spreads evenly at any corpus size. */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String,
                 canonCol: String = "url_canonical"): DataFrame = {
    val w = Window.partitionBy(col(canonCol)).orderBy(col(idCol))
    df.withColumn(canonCol, canonicalizeUrl(col(urlCol)))
      .filter(col(canonCol).isNotNull)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
  }
}
