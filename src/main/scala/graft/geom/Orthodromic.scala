package graft.geom

import org.locationtech.jts.geom.{Coordinate, Envelope, Geometry, Point}
import org.locationtech.jts.operation.distance.DistanceOp

/** Great-circle distance, reproducing the reference's exact formula so
  * results hash-match: spherical law of cosines, R = 6371 km, acos argument
  * clamped to 1.0
  * (reference: server-plugin/.../pipes/processing/OrthodromicDistance.java:85-97).
  */
object Orthodromic {
  val EarthRadiusKm = 6371.0

  def distanceKm(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double =
    math.acos(
      math.min(
        math.sin(math.toRadians(lat1)) * math.sin(math.toRadians(lat2)) +
          math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
          math.cos(math.toRadians(lon2) - math.toRadians(lon1)),
        1.0)) * EarthRadiusKm

  /** Point-to-geometry: for non-points, take planar nearest points first then
    * measure orthodromically between them — same two-step the reference does
    * (reference: OrthodromicDistance.java:62-72).
    */
  def distanceToGeometryKm(refLon: Double, refLat: Double, g: Geometry): Double = g match {
    case p: Point => distanceKm(refLon, refLat, p.getX, p.getY)
    case _ =>
      val refPoint = g.getFactory.createPoint(new Coordinate(refLon, refLat))
      val nearest = new DistanceOp(refPoint, g).nearestPoints()
      distanceKm(nearest(0).x, nearest(0).y, nearest(1).x, nearest(1).y)
  }

  /** Degree-space search window for a km radius, with cos(lat) longitude
    * compensation (reference: OrthodromicDistance.java:74-90). Used as the
    * cheap bbox pre-filter before the exact orthodromic test.
    */
  def searchWindow(lon: Double, lat: Double, maxDistanceKm: Double): Envelope = {
    val latDegrees = math.toDegrees(maxDistanceKm / EarthRadiusKm)
    val lonDegrees = math.toDegrees(maxDistanceKm / EarthRadiusKm / math.cos(math.toRadians(lat)))
    new Envelope(lon - lonDegrees, lon + lonDegrees, lat - latDegrees, lat + latDegrees)
  }

  /** Conservative LOWER bound on the orthodromic distance from (lon,lat) to
    * ANY point outside the degree window [lon±half, lat±half]. An outside
    * point has |Δlat| ≥ half (central angle ≥ Δlat ⇒ d ≥ R·half_rad) or
    * |Δlon| ≥ half with its latitude inside the band (θ grows with |Δλ|, so
    * the minimum sits on the Δλ = half edge — minimized numerically over
    * the band, then shrunk 0.1% to absorb grid error). Used by the exact
    * k-NN window verification (GeoFrame.knnCandidates).
    */
  def minDistanceOutsideWindowKm(lon: Double, lat: Double, halfDeg: Double): Double = {
    val latBound = EarthRadiusKm * math.toRadians(halfDeg)
    var lonBound = Double.MaxValue
    val n = 2048
    var i = 0
    while (i <= n) {
      val lat2 = lat - halfDeg + (2.0 * halfDeg * i) / n
      if (lat2 >= -90 && lat2 <= 90) {
        val d = distanceKm(lon, lat, lon + halfDeg, lat2)
        if (d < lonBound) lonBound = d
      }
      i += 1
    }
    0.999 * math.min(latBound, lonBound)
  }

  /** Sum of orthodromic segment lengths along a geometry's coordinates.
    * The reference uses GeoTools' GeodeticCalculator (ellipsoidal)
    * (reference: OrthodromicLength.java:34-74); GeoTools is unavailable here,
    * so we sum the spherical formula per segment — documented tolerance vs
    * geodesic is ~0.3% (sphere vs WGS84 ellipsoid).
    */
  def lengthKm(g: Geometry): Double = {
    val cs = g.getCoordinates
    var sum = 0.0
    var i = 1
    while (i < cs.length) {
      sum += distanceKm(cs(i - 1).x, cs(i - 1).y, cs(i).x, cs(i).y)
      i += 1
    }
    sum
  }
}
