package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IPv4 network enrichment (SURVEY.md §2.6 extension): longest-prefix-match
  * CIDR lookup — the geo/ASN/internal-network tagging join every access-log
  * or crawl-telemetry pipeline runs, and the network-level counterpart to
  * the [[Pii]] scrub (drop or bucket traffic from known ranges).
  *
  * The join is non-equi by nature (`ip ∈ [net, net+2^(32−len))`), but the
  * classic prefix-expansion makes it an EQUI-join: the dim table's
  * distinct prefix lengths (≤ 33, model-sized by construction) broadcast,
  * each distinct IP value fans out one masked candidate per present
  * length, and the longest matching length wins per value. Fan-out =
  * |distinct lengths| (single digits in real routing/geo tables), every
  * join is hash/equi, and nothing scales with the dim beyond its own
  * size. Masking is `ip − (ip % 2^(32−len))` — plain nonnegative-long
  * arithmetic, exactly restatable in a second engine (no variable-width
  * shift builtins needed).
  */
object Networks {

  /** Dotted-quad → unsigned-in-a-BIGINT numeric form, null for anything
    * that is not a strict 4-octet 0–255 address (no leading-`+`, no
    * spaces). Pure Column arithmetic — codegen-resident, and exactly
    * restatable in a second engine. */
  def ipv4ToLong(ip: Column): Column = {
    val oct = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[0-9][0-9]?)"
    val full = s"^$oct\\.$oct\\.$oct\\.$oct$$"
    val p = split(ip, "\\.")
    when(ip.rlike(full),
      element_at(p, 1).cast("long") * 16777216L +
        element_at(p, 2).cast("long") * 65536L +
        element_at(p, 3).cast("long") * 256L +
        element_at(p, 4).cast("long"))
  }

  /** Host-bits mask: `v − (v % 2^(32−len))`, exact for 0 ≤ len ≤ 32
    * (`pow(2, k)` is exact in double through k = 32). */
  private def maskTo(v: Column, len: Column): Column =
    v - (v % pow(lit(2.0), lit(32) - len).cast("long"))

  /** Longest-prefix-match join: one output row per `ips` row, enriched
    * with the columns of its most-specific covering network from `cidrs`
    * (a `cidrCol` of `a.b.c.d/len` strings), nulls when nothing covers it
    * (left-join semantics). Malformed addresses and malformed CIDRs are
    * ignored (null-masked out) rather than failing the pipeline —
    * telemetry tables are dirty by nature; count them upstream with
    * [[ipv4ToLong]]`.isNull` if the rate matters. Duplicate CIDR rows at
    * the same (net, len): the lookup is deterministic only if the dim is
    * — dedup your routing table (ties break arbitrarily-but-stably only
    * on `__len`, which equal-net duplicates share).
    *
    * Scale shape: the match runs once per DISTINCT address value (the
    * lookup-table form — duplicate-row-safe and usually orders of
    * magnitude smaller than the fact table), candidates per value are
    * ≤ |present lengths| (bounded window groups), and the final
    * enrichment is one equi-join back on the address column. */
  def cidrLookup(ips: DataFrame, ipCol: String,
                 cidrs: DataFrame, cidrCol: String): DataFrame = {
    val collisions = ips.columns.toSet intersect cidrs.columns.toSet
    require(collisions.isEmpty,
      s"ip/cidr column names collide: $collisions — rename before joining")
    val parsedDim = cidrs
      .withColumn("__len", regexp_extract(col(cidrCol), "/([0-9]{1,2})$", 1)
        .cast("int"))
      .withColumn("__net",
        ipv4ToLong(regexp_extract(col(cidrCol), "^(.*)/[0-9]{1,2}$", 1)))
      .filter(col("__len").isNotNull && col("__len").between(0, 32) &&
        col("__net").isNotNull)
      // canonical form: mask off host bits so 10.1.2.3/8 == 10.0.0.0/8
      .withColumn("__net", maskTo(col("__net"), col("__len")))
    // the distinct prefix lengths present — ≤ 33 rows, model state
    val lengths = parsedDim.select(col("__len")).distinct()
    val candidates = ips.select(col(ipCol)).distinct()
      .withColumn("__ip", ipv4ToLong(col(ipCol)))
      .filter(col("__ip").isNotNull)
      .crossJoin(broadcast(lengths))
      .withColumn("__net", maskTo(col("__ip"), col("__len")))
    val w = Window.partitionBy(col(ipCol)).orderBy(col("__len").desc)
    val lookup = candidates.join(parsedDim, Seq("__len", "__net"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select((ipCol +: cidrs.columns.toSeq).map(col): _*)
    ips.join(lookup, Seq(ipCol), "left")
  }
}
