package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Haversine + grid-blocked radius join ([[Geo]]): published-distance
  * pins, blocking-coverage edges (cell boundaries, high latitude), and a
  * brute-force reference on random points. */
class GeoSpec extends SparkSuite {
  import spark.implicits._

  private def hav(a: (Double, Double), b: (Double, Double)): Double = {
    val (la1, lo1) = a; val (la2, lo2) = b
    val sLat = math.sin(math.toRadians(la2 - la1) / 2)
    val sLon = math.sin(math.toRadians(lo2 - lo1) / 2)
    val h = sLat * sLat + math.cos(math.toRadians(la1)) *
      math.cos(math.toRadians(la2)) * sLon * sLon
    2 * Geo.EarthRadiusKm * math.asin(math.sqrt(h))
  }

  test("haversineKm: known city distances within spherical tolerance") {
    // Paris ↔ London great-circle ≈ 344 km; NYC ↔ LA ≈ 3936 km
    val df = Seq((48.8566, 2.3522, 51.5074, -0.1278),
      (40.7128, -74.0060, 34.0522, -118.2437)).toDF("a", "b", "c", "d")
    val got = df.select(Geo.haversineKm(col("a"), col("b"), col("c"), col("d")))
      .as[Double].collect()
    assert(math.abs(got(0) - 343.6) < 2.0)
    assert(math.abs(got(1) - 3936.0) < 10.0)
    assert(got(0) == hav((48.8566, 2.3522), (51.5074, -0.1278))) // bit-equal local mirror
  }

  test("radiusJoin: in/out pairs across cell boundaries") {
    val facilities = Seq((100L, 45.0, 10.0)).toDF("fid", "flat", "flon")
    val pts = Seq(
      (1L, 45.0, 10.0),    // 0 km — in
      (2L, 45.8, 10.0),    // ~89 km north — in
      (3L, 46.5, 10.0),    // ~167 km — out at r=100
      (4L, 45.0, 11.2),    // ~94 km east at lat 45 — in
      (5L, 45.0, 12.0))    // ~157 km — out
      .toDF("pid", "plat", "plon")
    val got = Geo.radiusJoin(pts, "plat", "plon", facilities, "flat", "flon",
        radiusKm = 100.0)
      .select("pid", "fid").as[(Long, Long)].collect().map(_._1).toSet
    assert(got == Set(1L, 2L, 4L))
  }

  test("radiusJoin matches a brute-force reference on random points") {
    val rnd = new scala.util.Random(67)
    val ls = (0 until 200).map(i =>
      (i.toLong, 30 + rnd.nextDouble() * 25, -10 + rnd.nextDouble() * 20))
    val rs = (0 until 60).map(i =>
      (i.toLong, 30 + rnd.nextDouble() * 25, -10 + rnd.nextDouble() * 20))
    val got = Geo.radiusJoin(ls.toDF("lid", "la", "lo"),
        "la", "lo", rs.toDF("rid", "ra", "ro"), "ra", "ro", radiusKm = 120.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = (for { (li, la, lo) <- ls; (ri, ra, ro) <- rs
      d6 = math.floor(hav((la, lo), (ra, ro)) * 1e6 + 0.5) / 1e6
      if d6 <= 120.0 } yield (li, ri)).toSet
    assert(got == want)
  }

  test("radiusJoin: polar rows hard-fail; bad coordinates drop silently") {
    val l = Seq((1L, 75.0, 0.0)).toDF("lid", "la", "lo")
    val r = Seq((2L, 74.5, 0.0)).toDF("rid", "ra", "ro")
    val e = intercept[Exception] {
      Geo.radiusJoin(l, "la", "lo", r, "ra", "ro", 100.0).collect()
    }
    assert(e.getMessage != null)
    // raising the cap admits the polar band
    val ok = Geo.radiusJoin(l, "la", "lo", r, "ra", "ro", 100.0, maxAbsLat = 80.0)
    assert(ok.count() == 1)
    // null / out-of-range coordinates drop, never raise
    val dirty = Seq((3L, Some(200.0), Some(0.0)), (4L, None, Some(1.0)))
      .toDF("lid", "la", "lo")
    assert(Geo.radiusJoin(dirty, "la", "lo", r, "ra", "ro", 100.0).count() == 0)
  }
}
