package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial enrichment (SURVEY.md §2.6 extension): great-circle distance
  * and the radius join — "which events happened near which facility", the
  * store-locator/geo-dedup shape. No geo library: distance is the
  * haversine closed form over codegen'd trig Columns, and the join is
  * grid-cell blocking (the [[Joins.rangeJoin]] bin idea in two
  * dimensions), so both are exactly restatable in a second engine.
  */
object Geo {

  /** Mean Earth radius (IUGG R₁), km. */
  val EarthRadiusKm = 6371.0088

  /** Great-circle distance in km between two WGS84 points (haversine,
    * spherical model — ≤ 0.5% geodesic error, the standard trade for
    * analytics): `2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2)))`.
    * Pure double trig — codegen-resident, map-only. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val sdLat = sin(radians(lat2 - lat1) / 2)
    val sdLon = sin(radians(lon2 - lon1) / 2)
    val a = sdLat * sdLat + cos(radians(lat1)) * cos(radians(lat2)) * sdLon * sdLon
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** All (left, right) pairs within `radiusKm` great-circle km. Adds
    * `distance_km` (floor-rounded at 1e-6 — the comparison grid that
    * keeps a pair from flipping on cross-engine trig ulp). Null or
    * out-of-range coordinates drop; rows beyond `maxAbsLat` latitude
    * HARD-FAIL (plan-side raise_error) because the longitude-cell
    * expansion below is sized by `1/cos(maxAbsLat)` — polar data needs a
    * different blocking (cap cells), not silent wrong answers.
    *
    * Execution shape: 2-D grid-cell blocking. Cells are `radiusKm`
    * degrees-of-latitude wide, so a matching pair is at most 1 lat-cell
    * and `ceil(1/cos(maxAbsLat))` lon-cells apart; the LEFT side explodes
    * over that fixed neighborhood (3×(2·c+1) cells — 9 at the equator
    * band, 15 at the default 60° cap), the RIGHT side lands in its own
    * cell, and the match is one EQUI-join on the cell id + the exact
    * haversine filter. Hot cells (urban pileups) are AQE-skew equi-join
    * work; nothing is ever quadratic in the tables, only in true
    * neighbors.
    *
    * Known limitation (documented, standard for flat grid blocking):
    * pairs straddling the ±180° antimeridian are NOT matched — shift
    * longitudes before joining if your data crosses it. */
  def radiusJoin(left: DataFrame, latL: String, lonL: String,
                 right: DataFrame, latR: String, lonR: String,
                 radiusKm: Double, maxAbsLat: Double = 60.0): DataFrame = {
    require(radiusKm > 0, s"radiusKm must be positive, got $radiusKm")
    require(maxAbsLat > 0 && maxAbsLat < 89.0,
      s"maxAbsLat must be in (0, 89), got $maxAbsLat")
    val collisions = left.columns.toSet intersect right.columns.toSet
    require(collisions.isEmpty,
      s"left/right column names collide: $collisions — rename before joining")
    // on the SPHERE this distance lives on, 1° of arc = πR/180 = 111.195
    // km exactly — 111.0 is a strict under-estimate, so a radius-r pair
    // never spans more than one lat cell (and cellDeg/cos(maxAbsLat) of
    // longitude), which is what the fixed neighborhood relies on
    val cellDeg = radiusKm / 111.0
    val lonSpan = math.ceil(1.0 / math.cos(math.toRadians(maxAbsLat))).toInt
    def checked(df: DataFrame, latC: String, lonC: String): DataFrame = {
      val capMsg = concat(
        lit(s"radiusJoin: |latitude| exceeds maxAbsLat=$maxAbsLat (lat="),
        col(latC).cast("string"),
        lit(") — raise maxAbsLat (wider lon expansion) or pre-filter polar rows"))
      df.filter(col(latC).isNotNull && col(lonC).isNotNull &&
          col(latC).between(-90.0, 90.0) && col(lonC).between(-180.0, 180.0))
        .withColumn(latC, when(abs(col(latC)) <= maxAbsLat, col(latC))
          .otherwise(raise_error(capMsg).cast("double")))
    }
    val r = checked(right, latR, lonR)
      .withColumn("__cla", floor(col(latR) / cellDeg))
      .withColumn("__clo", floor(col(lonR) / cellDeg))
    val neighborhood = for { dLat <- -1 to 1; dLon <- -lonSpan to lonSpan }
      yield struct(lit(dLat).as("a"), lit(dLon).as("o"))
    val l = checked(left, latL, lonL)
      .withColumn("__d", explode(array(neighborhood: _*)))
      .withColumn("__cla", floor(col(latL) / cellDeg) + col("__d.a"))
      .withColumn("__clo", floor(col(lonL) / cellDeg) + col("__d.o"))
      .drop("__d")
    l.join(r, Seq("__cla", "__clo"))
      .withColumn("distance_km",
        floor(haversineKm(col(latL), col(lonL), col(latR), col(lonR)) * 1e6
          + lit(0.5)) / 1e6)
      .filter(col("distance_km") <= radiusKm)
      .drop("__cla", "__clo")
  }
}
