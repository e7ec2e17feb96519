package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** URL canonicalization & URL-level dedup ([[Urls]]): every
  * canonicalization rule pinned on a single-row example, NULL contract for
  * non-absolute inputs, keep-first semantics and the WindowGroupLimit
  * pre-prune plan shape of [[Urls.dedupByUrl]]. */
class UrlsSpec extends SparkSuite {
  import spark.implicits._

  private def canon(u: String): String = {
    val r = Seq(Tuple1(u)).toDF("u")
      .select(Urls.canonicalizeUrl(col("u")).as("c")).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("scheme and host lowercase; path case preserved") {
    assert(canon("HTTP://WWW.Example.COM/Path/File") == "http://www.example.com/Path/File")
  }

  test("userinfo dropped, default ports dropped, explicit ports kept") {
    assert(canon("http://user:pw@a.com:80/x") == "http://a.com/x")
    assert(canon("https://a.com:443/x") == "https://a.com/x")
    assert(canon("https://a.com:8443/x") == "https://a.com:8443/x")
    assert(canon("http://a.com:443/x") == "http://a.com:443/x") // non-default for http
  }

  test("trailing slashes strip; empty path becomes /") {
    assert(canon("http://a.com") == "http://a.com/")
    assert(canon("http://a.com/") == "http://a.com/")
    assert(canon("http://a.com/x///") == "http://a.com/x")
  }

  test("tracking params drop, survivors sort, bare ? and fragment vanish") {
    assert(canon("http://a.com/x?utm_source=s&b=2&a=1&gclid=g&fbclid=f&ref=r") ==
      "http://a.com/x?a=1&b=2")
    assert(canon("http://a.com/x?utm_campaign=c") == "http://a.com/x")
    assert(canon("http://a.com/x?") == "http://a.com/x")
    assert(canon("http://a.com/x#frag?not=query") == "http://a.com/x")
    // a non-tracking key PREFIXED by a tracking name must survive
    assert(canon("http://a.com/x?reference=1") == "http://a.com/x?reference=1")
  }

  test("non-absolute inputs canonicalize to NULL") {
    assert(canon("not a url") == null)
    assert(canon("/relative/path") == null)
    assert(canon("example.com/x") == null)
    assert(canon("") == null)
    // empty host (scheme present, no authority) is malformed too
    assert(canon("http:///path") == null)
  }

  test("urlHost and registrableDomain") {
    val df = Seq(
      ("http://u@A.B.Example.COM:8080/x", "a.b.example.com", "example.com"),
      ("https://localhost/x", "localhost", "localhost"),
      ("nope", null, null)
    ).toDF("u", "h", "d")
    val got = df.select(
      Urls.urlHost(col("u")).as("gh"), col("h"),
      Urls.registrableDomain(col("u")).as("gd"), col("d")).collect()
    got.foreach { r =>
      assert(r.get(0) == r.get(1), s"host mismatch: ${r.get(0)} vs ${r.get(1)}")
      assert(r.get(2) == r.get(3), s"domain mismatch: ${r.get(2)} vs ${r.get(3)}")
    }
  }

  test("IPv6 bracket hosts survive intact (regression: first-colon truncation merged distinct hosts)") {
    assert(canon("http://[2001:DB8::1]/x") == "http://[2001:db8::1]/x")
    assert(canon("http://[2001:db8::1]:8080/x") == "http://[2001:db8::1]:8080/x")
    assert(canon("http://[2001:db8::1]:80/x") == "http://[2001:db8::1]/x")
    assert(canon("https://[::1]:443/x") == "https://[::1]/x")
    // the ADVICE failure mode: two distinct v6 hosts must NOT canonicalize equal
    assert(canon("http://[2001:db8::1]/x") != canon("http://[2001:db8::2]/x"))
    // RFC 5952: spelling variants of ONE address DO canonicalize equal —
    // leading zeros strip, the longest zero run compresses
    assert(canon("http://[2001:0db8::1]/x") == "http://[2001:db8::1]/x")
    assert(canon("http://[2001:db8:0:0:0:0:0:1]/x") == "http://[2001:db8::1]/x")
    assert(canon("http://[0:0:0:0:0:0:0:1]/x") == "http://[::1]/x")
    // non-parsing bracket contents (zone id) fall back lowercased-verbatim
    assert(canon("http://[fe80::1%25ETH0]/x") == "http://[fe80::1%25eth0]/x")
    // unclosed bracket is malformed → NULL
    assert(canon("http://[2001:db8/x") == null)
    val r = Seq(Tuple1("https://u:p@[2001:DB8::1]:8443/x")).toDF("u")
      .select(Urls.urlHost(col("u")), Urls.registrableDomain(col("u"))).head()
    assert(r.getString(0) == "[2001:db8::1]")
    assert(r.isNullAt(1), "an IPv6 address has no registrable domain")
  }

  test("percent-encoding normalization: unreserved decode, hex uppercase, reserved kept") {
    // RFC 3986 §6.2.2.1-.2: the three spellings of ~user are ONE resource
    assert(canon("http://a.com/%7euser") == "http://a.com/~user")
    assert(canon("http://a.com/%7Euser") == "http://a.com/~user")
    assert(canon("http://a.com/~user") == "http://a.com/~user")
    // reserved escape: kept encoded (%2F ≠ /), hex uppercased
    assert(canon("http://a.com/a%2fb") == "http://a.com/a%2Fb")
    assert(canon("http://a.com/%41%62%2D%5f") == "http://a.com/Ab-_")
    // query side normalizes too, before the param sort
    assert(canon("http://a.com/x?k=%76%2f&a=1") == "http://a.com/x?a=1&k=v%2F")
    // malformed escapes pass through verbatim (stable, not decoded)
    assert(canon("http://a.com/100%") == "http://a.com/100%")
    assert(canon("http://a.com/%4x") == "http://a.com/%4x")
  }

  test("registrableDomain follows PSL rule semantics over the embedded subset") {
    val vecs = Seq(
      // ccTLD second-level suffixes — the groupings the last-two-labels
      // heuristic got wrong (foo.co.uk under co.uk)
      ("https://a.b.example.CO.UK/x", "example.co.uk"),
      ("https://shop.example.com.au/x", "example.com.au"),
      ("https://news.site.co.jp/x", "site.co.jp"),
      // unlisted TLDs take the PSL default rule — classic two labels
      ("https://www.example.com/x", "example.com"),
      ("https://a.b.example.dev/x", "example.dev"),
      // wildcard rule *.ck: any direct child of ck is a public suffix
      ("https://deep.sub.foo.ck/x", "sub.foo.ck"),
      // exception rule !www.ck: registrable despite the wildcard
      ("https://www.ck/x", "www.ck"),
      ("https://a.www.ck/x", "www.ck"),
      // a host that IS a public suffix self-maps (total grouping key)
      ("https://co.uk/x", "co.uk"),
      ("https://com/x", "com"),
      // IPv4 addresses have no registrable domain
      ("https://192.168.0.1/x", null),
      ("nope", null)
    )
    val got = vecs.toDF("u", "want")
      .select(Urls.registrableDomain(col("u")).as("got"), col("want"), col("u"))
      .collect()
    got.foreach(r => assert(r.get(0) == r.get(1),
      s"${r.get(2)}: got ${r.get(0)}, want ${r.get(1)}"))
  }

  test("registrableDomainViaTable matches the literal path rule-for-rule") {
    // the full-PSL escape hatch (broadcast rules table) must agree with
    // the literal-array path on every vector class: exact/wildcard/
    // exception rules, unlisted-TLD default, suffix-self totality,
    // IPv4/bracket-IPv6 → NULL, malformed → NULL
    val urls = Seq(
      "https://a.b.example.CO.UK/x", "https://shop.example.com.au/x",
      "https://news.site.co.jp/x", "https://www.example.com/x",
      "https://a.b.example.dev/x", "https://deep.sub.foo.ck/x",
      "https://www.ck/x", "https://a.www.ck/x", "https://co.uk/x",
      "https://com/x", "https://192.168.0.1/x",
      "https://[2001:db8::1]:8443/x", "nope"
    ).zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("doc_id", "u")
    val rulesDf = Urls.DefaultPublicSuffixRules.map(Tuple1(_)).toDF("rule")
    val viaTable = Urls.registrableDomainViaTable(urls, rulesDf, "u", "doc_id")
      .select(col("doc_id"), col("domain"))
    val literal = urls.select(col("doc_id"),
      Urls.registrableDomain(col("u")).as("domain"))
    val diff = viaTable.exceptAll(literal).unionAll(literal.exceptAll(viaTable))
    assert(diff.isEmpty, s"paths diverge: ${diff.collect().mkString(", ")}")
    // 1:1 row preservation through the explode/agg/join round-trip
    assert(viaTable.count() == urls.count())
  }

  test("via-table paths broadcast the small side; no nested loop anywhere") {
    import spark.implicits._
    val urls = (0L until 100L).map(i => (i, s"https://site$i.co.uk/p")).toDF("id", "u")
    val rulesDf = Urls.DefaultPublicSuffixRules.map(Tuple1(_)).toDF("rule")
    val pslPlan = Urls.registrableDomainViaTable(urls, rulesDf, "u", "id")
      .queryExecution.executedPlan.toString
    assert(pslPlan.contains("BroadcastHashJoin"), s"rules side not broadcast:\n$pslPlan")
    assert(!pslPlan.contains("CartesianProduct") && !pslPlan.contains("NestedLoop"),
      s"via-table PSL path must never cross-product:\n$pslPlan")
    val blockPlan = Urls.filterBlockedDomainsViaTable(urls,
      Seq("ex.org").toDF("domain"), "u", "id")
      .queryExecution.executedPlan.toString
    assert(!blockPlan.contains("CartesianProduct") && !blockPlan.contains("NestedLoop"),
      s"via-table blocklist must never cross-product:\n$blockPlan")
  }

  test("registrableDomain with caller-supplied rules and the Nil fallback") {
    // custom table wins over the embedded default
    val custom = Seq(Tuple1("https://x.y.mysuffix.example/p")).toDF("u")
      .select(Urls.registrableDomain(col("u"), Seq("mysuffix.example"))).head()
    assert(custom.getString(0) == "y.mysuffix.example")
    // Nil = pure default rule = the old last-two-labels heuristic
    val twoLabel = Seq(Tuple1("https://a.b.example.co.uk/p")).toDF("u")
      .select(Urls.registrableDomain(col("u"), Nil)).head()
    assert(twoLabel.getString(0) == "co.uk")
  }

  test("dedupByUrl collapses percent-spelling and v6-port variants of one resource") {
    val df = Seq(
      (1L, "http://a.com/%7Euser"),
      (2L, "http://a.com/~user"),
      (3L, "http://a.com/%7euser"),
      (4L, "http://[2001:db8::1]:80/x"),
      (5L, "http://[2001:db8::1]/x"),
      (6L, "http://[2001:db8::2]/x") // DIFFERENT v6 host — must survive
    ).toDF("id", "url")
    val out = Urls.dedupByUrl(df, "url", "id")
      .select("id", "url_canonical").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "http://a.com/~user"),
      (4L, "http://[2001:db8::1]/x"), (6L, "http://[2001:db8::2]/x")))
  }

  test("dedupByUrl keeps the min-id row per canonical URL; malformed rows drop") {
    val df = Seq(
      (3L, "http://A.com/x/?utm_source=s"),
      (1L, "HTTP://a.COM/x#frag"),
      (2L, "http://a.com/x"),
      (5L, "http://b.com/y"),
      (6L, "garbage")
    ).toDF("id", "url")
    val out = Urls.dedupByUrl(df, "url", "id")
      .select("id", "url_canonical").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "http://a.com/x"), (5L, "http://b.com/y")))
  }

  test("filterBlockedDomains: label-boundary suffix match, never substring") {
    val df = Seq(
      (1L, "https://ex.org/a"),          // blocked exactly
      (2L, "https://a.b.EX.org/a"),      // subdomain, case-insensitive
      (3L, "https://index.org/a"),       // substring cousin — KEPT
      (4L, "https://ex.org.evil.com/a"), // blocked string not a SUFFIX — kept
      (5L, "https://other.com/a"),
      (6L, "not a url")                  // malformed — kept (not a blocklist hit)
    ).toDF("id", "url")
    val kept = Urls.filterBlockedDomains(df, "url", Seq("EX.org"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L, 5L, 6L))
  }

  test("filterBlockedDomainsViaTable matches the literal path row-for-row") {
    // the big-blocklist escape hatch (semi-join + anti-join) must agree
    // with the literal-array path on every vector class: exact hit,
    // subdomain, case, substring cousin, non-suffix, malformed-kept —
    // plus table-side noise (case, whitespace, null, empty, duplicates)
    val df = Seq(
      (1L, "https://ex.org/a"), (2L, "https://a.b.EX.org/a"),
      (3L, "https://index.org/a"), (4L, "https://ex.org.evil.com/a"),
      (5L, "https://other.com/a"), (6L, "not a url"),
      (7L, "https://tracker.net/x"), (8L, "https://sub.tracker.NET/x")
    ).toDF("id", "url")
    val blockedSeq = Seq("EX.org", "tracker.net")
    val blockedDf = Seq(" EX.org ", "tracker.net", "TRACKER.NET", "", null)
      .map(Tuple1(_)).toDF("domain")
    val literal = Urls.filterBlockedDomains(df, "url", blockedSeq)
    val viaTable = Urls.filterBlockedDomainsViaTable(df, blockedDf, "url", "id")
    val diff = literal.exceptAll(viaTable).unionAll(viaTable.exceptAll(literal))
    assert(diff.isEmpty, s"paths diverge: ${diff.collect().mkString(", ")}")
    assert(viaTable.select("id").as[Long].collect().toSet == Set(3L, 4L, 5L, 6L))
  }

  test("hostSuffixes: label-boundary suffix chains; NULL for non-absolute") {
    val r = Seq(Tuple1("http://a.b.ex.org/x")).toDF("u")
      .select(Urls.hostSuffixes(col("u")).as("s")).head().getSeq[String](0)
    assert(r == Seq("org", "ex.org", "b.ex.org", "a.b.ex.org"))
    assert(Seq(Tuple1("nope")).toDF("u")
      .select(Urls.hostSuffixes(col("u")).as("s")).head().isNullAt(0))
  }

  test("canonicalizeUrl agrees with a java.net.URI-based reconstruction on 400 random URLs") {
    // independent second implementation: parse with the JDK's URI parser,
    // rebuild the canonical form from ITS components, and require
    // equality — a shared misparse would need the same bug in two
    // unrelated parsers. Seeded: reproducible across driver runs.
    val rnd = new scala.util.Random(42)
    // first char a letter: java.net.URI follows RFC 2396, whose hostname
    // toplabel must start alphabetic — an all-digit label nulls getHost
    def label() = ("abcXYZ"(rnd.nextInt(6)) +: (1 until 1 + rnd.nextInt(7)).map(_ =>
      "abcXYZ019"(rnd.nextInt(9)))).mkString
    def genUrl(): String = {
      val scheme = Seq("http", "https", "HTTP", "HtTpS", "ftp")(rnd.nextInt(5))
      val userinfo = Seq("", "", "user@", "u:p@")(rnd.nextInt(4))
      val host = (1 to 1 + rnd.nextInt(3)).map(_ => label()).mkString(".")
      val port = Seq("", "", ":80", ":443", ":8080", ":65535")(rnd.nextInt(6))
      val path = if (rnd.nextBoolean()) ""
        else "/" + (1 to rnd.nextInt(4)).map(_ => label()).mkString("/") +
          (if (rnd.nextBoolean()) "/" else "")
      val keys = Seq("a", "b", "id", "utm_source", "utm_campaign", "ref",
        "reference", "gclid", "fbclid")
      val query = if (rnd.nextBoolean()) ""
        else "?" + (1 to 1 + rnd.nextInt(4)).map(_ =>
          keys(rnd.nextInt(keys.size)) + "=" + label()).mkString("&")
      val frag = Seq("", "", "#top", "#s2")(rnd.nextInt(4))
      s"$scheme://$userinfo$host$port$path$query$frag"
    }
    def expected(u: String): String = {
      val uri = new java.net.URI(u)
      val scheme = uri.getScheme.toLowerCase
      val host = uri.getHost.toLowerCase
      val port = uri.getPort
      val portPart = if (port == -1 || (scheme == "http" && port == 80) ||
        (scheme == "https" && port == 443)) "" else s":$port"
      val p0 = Option(uri.getRawPath).getOrElse("").replaceAll("/+$", "")
      val path = if (p0.isEmpty) "/" else p0
      val params = Option(uri.getRawQuery).map(_.split("&").toSeq).getOrElse(Nil)
        .filter(s => s.nonEmpty && !s.matches("^(utm_[^=]*|gclid|fbclid|ref)=.*"))
        .sorted
      val qPart = if (params.isEmpty) "" else "?" + params.mkString("&")
      s"$scheme://$host$portPart$path$qPart"
    }
    val urls = (1 to 400).map(_ => genUrl())
    val got = urls.toDF("u")
      .select(col("u"), Urls.canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    urls.foreach { u =>
      assert(got(u) == expected(u), s"mismatch for $u")
    }
  }

  test("dedupByUrl plan pre-prunes map-side (WindowGroupLimit before the exchange)") {
    val df = spark.range(1000).select(col("id"),
      concat(lit("http://a.com/p/"), (col("id") % 10).cast("string")).as("url"))
    val plan = Urls.dedupByUrl(df, "url", "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit pre-prune in plan:\n$plan")
  }
test("urlTemplates: hex and digit runs collapse, counts per template") {
    import spark.implicits._
    val urls = Seq(
      "https://a.com/p/1", "https://a.com/p/2", "https://a.com/p/2",  // dup URL
      "https://a.com/item/deadbeefcafe1234/view",
      "https://a.com/item/0123456789abcdef/view",
      "https://b.com/about",
      "not a url").toDF("url")
    val out = Urls.urlTemplates(urls, "url")
      .select("host", "template", "n_urls", "n_ids")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out(("a.com", "/p/{n}")) == ((3L, 2L)))          // 3 urls, 2 ids
    assert(out(("a.com", "/item/{hex}/view")) == ((2L, 2L)))
    assert(out(("b.com", "/about")) == ((1L, 1L)))
    assert(out.size == 3) // the unparseable row dropped
    // short hex-looking runs are NOT collapsed to {hex} (8+ only)
    val short = Urls.urlTemplates(Seq("https://c.com/tag/abc123").toDF("url"), "url")
      .select("template").as[String].head()
    assert(short == "/tag/abc{n}")
  }
}
