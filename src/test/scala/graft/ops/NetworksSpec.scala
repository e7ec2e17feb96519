package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** CIDR longest-prefix-match lookup ([[Networks]]): address parsing edges,
  * LPM tie-breaking, host-bit canonicalization, duplicate-row safety, and
  * a brute-force reference on random addresses × a random routing table. */
class NetworksSpec extends SparkSuite {
  import spark.implicits._

  test("ipv4ToLong: strict dotted-quad parsing") {
    val cases = Seq(
      ("0.0.0.0", Some(0L)), ("255.255.255.255", Some(4294967295L)),
      ("10.0.0.1", Some(167772161L)), ("192.168.1.1", Some(3232235777L)),
      ("256.1.1.1", None), ("1.2.3", None), ("1.2.3.4.5", None),
      ("a.b.c.d", None), ("1.2.3.4 ", None), ("", None))
    val got = cases.map(_._1).toDF("ip")
      .select(Networks.ipv4ToLong(col("ip"))).as[Option[Long]].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("cidrLookup: longest prefix wins; misses get nulls; host bits canonicalize") {
    val dim = Seq(
      ("10.0.0.0/8", "corp"),
      ("10.1.0.0/16", "corp-dc1"),      // more specific than /8
      ("10.1.2.3/24", "corp-dc1-rack"), // host bits set → canonicalizes to 10.1.2.0/24
      ("0.0.0.0/0", "default")).toDF("cidr", "zone")
    val ips = Seq("10.2.9.9", "10.1.9.9", "10.1.2.77", "8.8.8.8", "bogus")
      .toDF("ip")
    val got = Networks.cidrLookup(ips, "ip", dim, "cidr")
      .select("ip", "zone").as[(String, Option[String])].collect().toMap
    assert(got("10.2.9.9").contains("corp"))
    assert(got("10.1.9.9").contains("corp-dc1"))
    assert(got("10.1.2.77").contains("corp-dc1-rack"))
    assert(got("8.8.8.8").contains("default"))
    assert(got("bogus").isEmpty) // unparsable → left-join nulls
  }

  test("cidrLookup: duplicate fact rows each keep their enrichment") {
    val dim = Seq(("192.168.0.0/16", "lan")).toDF("cidr", "zone")
    val ips = Seq(("192.168.1.1", 1), ("192.168.1.1", 2), ("1.1.1.1", 3))
      .toDF("ip", "tag")
    val got = Networks.cidrLookup(ips, "ip", dim, "cidr")
      .select("tag", "zone").as[(Int, Option[String])].collect().toMap
    assert(got(1).contains("lan") && got(2).contains("lan") && got(3).isEmpty)
  }

  test("cidrLookup matches a brute-force LPM reference") {
    val rnd = new scala.util.Random(61)
    val nets = (0 until 40).map { _ =>
      val len = Seq(8, 12, 16, 20, 24, 28, 32)(rnd.nextInt(7))
      val ip = rnd.nextInt() & 0xffffffffL
      val net = ip - (ip % (1L << (32 - len)))
      (s"${net >> 24 & 255}.${net >> 16 & 255}.${net >> 8 & 255}.${net & 255}/$len",
        net, len)
    }.distinct
    val addrs = (0 until 300).map { _ =>
      // half the addresses land inside a random net for guaranteed hits
      if (rnd.nextBoolean()) {
        val (_, net, len) = nets(rnd.nextInt(nets.size))
        net + (rnd.nextInt(1 << math.min(16, 32 - len)).toLong)
      } else rnd.nextInt() & 0xffffffffL
    }.map(v => s"${v >> 24 & 255}.${v >> 16 & 255}.${v >> 8 & 255}.${v & 255}")
    val got = Networks.cidrLookup(addrs.toDF("ip"), "ip",
        nets.map(_._1).map(Tuple1(_)).toDF("cidr"), "cidr")
      .select("ip", "cidr").as[(String, Option[String])].collect()
      .groupBy(_._1).view.mapValues(_.head._2).toMap
    def toLong(ip: String) = ip.split("\\.").map(_.toLong)
      .reduce(_ * 256 + _)
    for (a <- addrs.distinct) {
      val v = toLong(a)
      val want = nets.filter { case (_, net, len) =>
        v - (v % (1L << (32 - len))) == net || len == 32 && v == net }
        .sortBy(-_._3).headOption.map(_._1)
      assert(got(a) == want, s"ip=$a got=${got(a)} want=$want")
    }
  }
}
