package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robots Exclusion Protocol (RFC 9309) evaluation — the crawl-governance
  * stage a responsible large-scale pipeline runs BEFORE any content stage:
  * given the per-domain `robots.txt` bodies a crawler fetched, decide for
  * every captured URL whether the configured user agent was allowed to
  * take it, and drop the rest. Complements the curation family's
  * blocklist stage (that's the operator's own policy; this is the site's).
  *
  * Semantics per the RFC: rules live in user-agent groups; the most
  * specific matching group wins (exact product token beats `*`, all
  * exact-matching groups combine); within the chosen rules the
  * LONGEST-pattern match decides, with `Allow` winning length ties;
  * no matching rule (or no robots.txt at all) means allowed. Patterns
  * support `*` wildcards and the `$` end anchor
  * ([[graft.expressions.Kernels.robotsMatch]] — a codegen-resident total
  * kernel, not a UDF). Empty-value `Disallow:` lines are dropped at parse
  * time (the RFC's "empty Disallow means allow everything").
  *
  * Scale shape: parsing is per-domain — the line-numbering window and the
  * group aggregations partition by domain and are bounded by the RFC's
  * own 500 KiB robots.txt size cap, so no skew hazard exists by
  * construction. Evaluation joins URLs to rules on the domain key
  * (rules ≪ URLs; AQE broadcasts small rule sets and skew-splits hot
  * domains) and reduces per URL with partial-aggregable `max` — the
  * per-reducer bound is rules-per-domain, not URLs-per-domain.
  */
object Robots {

  /** Parse robots.txt bodies into the rule set that applies to
    * `userAgent`: one row per (domain, allow, pattern).
    *
    * `robots` is `(domainCol, contentCol)` — one row per domain, the raw
    * fetched body. Group selection follows the RFC: a group is the run of
    * `User-agent:` lines plus the rules under them; if ANY group names
    * `userAgent` exactly (case-insensitive product token), only exact
    * groups apply, otherwise only `*` groups. */
  def rulesFor(robots: DataFrame, domainCol: String, contentCol: String,
               userAgent: String): DataFrame = {
    val ua = userAgent.toLowerCase(java.util.Locale.ROOT)
    // line split + comment strip + "directive: value" parse, map-only
    val lines = robots
      .filter(col(contentCol).isNotNull)
      .select(col(domainCol),
        posexplode(split(col(contentCol), "\r?\n")).as(Seq("__ln", "__raw")))
      .withColumn("__line", trim(regexp_replace(col("__raw"), "#.*$", "")))
      .filter(col("__line").contains(":"))
      .withColumn("__dir",
        lower(trim(substring_index(col("__line"), ":", 1))))
      .withColumn("__val",
        trim(expr("substring(__line, instr(__line, ':') + 1)")))
      .filter(col("__dir").isin("user-agent", "allow", "disallow"))
    // group numbering: a user-agent line NOT preceded by another
    // user-agent line starts a new group (consecutive UA lines share).
    // The window partitions by domain — bounded by the 500 KiB body cap.
    val w = Window.partitionBy(col(domainCol)).orderBy(col("__ln"))
    val grouped = lines
      .withColumn("__newGroup",
        (col("__dir") === "user-agent" &&
          (lag(col("__dir"), 1).over(w).isNull ||
            lag(col("__dir"), 1).over(w) =!= "user-agent")).cast("int"))
      .withColumn("__gid", sum(col("__newGroup")).over(w))
      .filter(col("__gid") > 0) // rules before any User-agent line are invalid per RFC
    // which groups match this agent, and how specifically
    val agents = grouped.filter(col("__dir") === "user-agent")
      .groupBy(col(domainCol), col("__gid"))
      .agg(max((lower(col("__val")) === ua).cast("int")).as("__exact"),
        max((col("__val") === "*").cast("int")).as("__star"))
    val domainHasExact = agents.groupBy(col(domainCol))
      .agg(max(col("__exact")).as("__hasExact"))
    val chosen = agents.join(domainHasExact, Seq(domainCol))
      .filter(when(col("__hasExact") === 1, col("__exact") === 1)
        .otherwise(col("__star") === 1))
      .select(col(domainCol), col("__gid"))
    grouped.filter(col("__dir").isin("allow", "disallow"))
      .filter(!(col("__dir") === "disallow" && col("__val") === "")) // empty Disallow = no rule
      .join(chosen, Seq(domainCol, "__gid"))
      .select(col(domainCol).as("domain"),
        (col("__dir") === "allow").as("allow"),
        col("__val").as("pattern"))
  }

  /** Path-plus-query of a URL (what REP rules match against); bare or
    * pathless URLs match as "/". */
  def urlPathQuery(url: Column): Column = {
    val p = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    when(p === "", lit("/")).otherwise(p)
  }

  /** Annotate `urls` with `allowedCol`: may `userAgent` (the agent
    * `rules` was resolved for) fetch this URL? Longest matching pattern
    * decides; `Allow` wins ties; parseable URLs with no matching rule or
    * a rule-less domain are allowed. UNPARSEABLE rows — no extractable
    * host (malformed or scheme-less URL), or a null url/id join key —
    * carry a NULL verdict rather than a silent `true` (r10 ADVICE): the
    * site policy is unknowable there, and the caller decides via
    * [[filterAllowed]]'s `keepUnparseable`. 1:1 row-preserving; verdicts
    * are computed per (idCol, urlCol) PAIR, so duplicated ids with
    * different urls keep independent verdicts instead of merging (r10
    * ADVICE — ids no longer need to be unique). */
  def annotateAllowed(urls: DataFrame, urlCol: String, idCol: String,
                      rules: DataFrame, allowedCol: String = "robots_allowed"): DataFrame = {
    val native = graft.expressions.native
    val withKey = urls
      .withColumn("__rdom", Urls.urlHost(col(urlCol)))
      .withColumn("__rpath", urlPathQuery(col(urlCol)))
    val scored = withKey
      .join(rules.withColumnRenamed("domain", "__rdom"), Seq("__rdom"), "left")
      .withColumn("__m",
        when(col("pattern").isNotNull &&
          native.robotsMatch(col("__rpath"), col("pattern")),
          length(col("pattern"))).otherwise(lit(-1)))
      .groupBy(col(idCol), col(urlCol))
      .agg(
        max(col("__rdom").isNotNull).as("__parsed"),
        max(when(col("allow") === true, col("__m")).otherwise(lit(-1))).as("__a"),
        max(when(col("allow") === false, col("__m")).otherwise(lit(-1))).as("__d"))
      .select(col(idCol), col(urlCol),
        when(!col("__parsed"), lit(null).cast("boolean"))
          .otherwise(col("__d") < 0 || col("__a") >= col("__d")).as(allowedCol))
    urls.join(scored, Seq(idCol, urlCol), "left")
  }

  /** [[annotateAllowed]] then keep only the allowed rows — the curation
    * filter form. `keepUnparseable` decides the NULL-verdict rows (URLs
    * with no extractable host, whose site policy cannot be resolved):
    * `true` (default — the historical fail-open behavior) keeps them for
    * downstream URL hygiene to handle; `false` is the conservative
    * politeness posture that fetches nothing it cannot check. */
  def filterAllowed(urls: DataFrame, urlCol: String, idCol: String,
                    rules: DataFrame, keepUnparseable: Boolean = true): DataFrame =
    annotateAllowed(urls, urlCol, idCol, rules)
      .filter(coalesce(col("robots_allowed"), lit(keepUnparseable)))
      .drop("robots_allowed")
}
