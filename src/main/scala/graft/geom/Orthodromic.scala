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

  /** Degree-space search window for a km radius (reference:
    * OrthodromicDistance.java:74-90 — but with the EXACT longitude extent
    * of the geodesic ball, asin(sin c / cos φ), rather than the reference's
    * first-order c/cos φ, which is strictly NARROWER and silently drops
    * in-radius rows near the window's east/west edge at high latitude —
    * ~0.9° of lon at lat 60 / radius 1500 km). When the ball reaches a
    * pole the longitude span is the full circle. The returned envelope may
    * extend past lon ±180; prune with [[st.bboxIntersectsWrapped]], which
    * splits it into the two wrapped intervals. Latitude is clamped to ±90.
    * Used as the cheap bbox pre-filter before the exact orthodromic test.
    */
  def searchWindow(lon: Double, lat: Double, maxDistanceKm: Double): Envelope = {
    val c = maxDistanceKm / EarthRadiusKm            // central angle, radians
    val latDegrees = math.toDegrees(c)
    val lonDegrees =
      if (c >= math.Pi / 2 || math.abs(lat) + latDegrees >= 90.0 - 1e-12) 180.0
      else math.toDegrees(math.asin(math.min(1.0,
        math.sin(c) / math.cos(math.toRadians(lat)))))
    new Envelope(lon - lonDegrees, lon + lonDegrees,
      math.max(-90.0, lat - latDegrees), math.min(90.0, lat + latDegrees))
  }

  /** Conservative LOWER bound on the orthodromic distance from (lon,lat) to
    * ANY point whose effective angular offsets satisfy |Δlat| ≥ half OR
    * |Δλ| ≥ half, where Δλ is longitude difference MOD 360 (so callers must
    * prune with wrapped intervals when the window crosses the antimeridian —
    * see GeoFrame.knnCandidates). Both arms are analytic, not sampled:
    *
    *  - |Δlat| ≥ half: central angle ≥ |Δlat| ⇒ d ≥ R·half_rad.
    *  - |Δλ| ≥ half: cos θ = sin φ₁ sin φ₂ + cos φ₁ cos φ₂ cos Δλ is, for
    *    fixed φ₁ and Δλ, a sinusoid A sin φ₂ + B cos φ₂ with A = sin φ₁,
    *    B = cos φ₁ cos Δλ, whose maximum over ALL φ₂ is √(A²+B²); and it is
    *    non-increasing in |Δλ| ∈ [0,π], so every such point has
    *    d ≥ R·acos(√(sin²φ₁ + cos²φ₁ cos²half)). (Unconstrained in φ₂ ⇒ a
    *    valid lower bound for the lat-band subset too.)
    *
    * The 1−1e−9 factor absorbs floating-point rounding between this closed
    * form and the per-row law-of-cosines evaluation; distance-scale slack is
    * the caller's `slackKm`. Used by the exact k-NN window verification.
    */
  def minDistanceOutsideWindowKm(lon: Double, lat: Double, halfDeg: Double): Double = {
    val h = math.toRadians(math.min(halfDeg, 180.0))
    val phi = math.toRadians(lat)
    val latBound = EarthRadiusKm * h
    val a = math.sin(phi)
    val b = math.cos(phi) * math.cos(h)
    val lonBound = EarthRadiusKm * math.acos(math.min(1.0, math.sqrt(a * a + b * b)))
    (1.0 - 1e-9) * math.min(latBound, lonBound)
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

  /** WGS84 semi-major axis in km and flattening (the ellipsoid GeoTools'
    * GeodeticCalculator defaults to in the reference's OrthodromicLength).
    */
  val WgsAKm = 6378.137
  val WgsF   = 1.0 / 298.257223563

  /** Ellipsoidal geodesic distance by the Andoyer-Lambert first-order
    * flattening correction — the closed-form (non-iterative) sibling of the
    * reference's GeodeticCalculator path (OrthodromicLength.java:34-74).
    * Accuracy is O(f²) ≈ 1e-5 relative (tens of meters on intercontinental
    * arcs, sub-meter regionally) — pinned by GeodesicSpec against published
    * Vincenty/Karney values. Closed form keeps it expressible both as
    * codegen'd Column arithmetic and in the DuckDB oracle, unlike the
    * iterative Vincenty recurrence.
    *
    * Degenerate branches (kept bit-identical in the SQL oracle):
    *  - s == 0: coincident points (or both poles) → 0.
    *  - c == 0: antipodal equatorial pair → spherical arc, no correction
    *    (the H1 term is singular there; Lambert's correction vanishes in the
    *    limit anyway since sin F = 0).
    */
  def geodesicKm(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    // half-angles averaged in DEGREES then converted — the exact operation
    // order the DuckDB oracle replays (radians((y1+y2)/2)), so the doubles
    // entering sin/cos are bit-identical on both engines
    val fMid = math.toRadians((lat1 + lat2) / 2.0)
    val gMid = math.toRadians((lat1 - lat2) / 2.0)
    val lam  = math.toRadians((lon1 - lon2) / 2.0)
    val sinF = math.sin(fMid); val cosF = math.cos(fMid)
    val sinG = math.sin(gMid); val cosG = math.cos(gMid)
    val sinL = math.sin(lam);  val cosL = math.cos(lam)
    val s = sinG * sinG * cosL * cosL + cosF * cosF * sinL * sinL
    val c = cosG * cosG * cosL * cosL + sinF * sinF * sinL * sinL
    if (s == 0.0) 0.0
    else {
      val omega = math.atan2(math.sqrt(s), math.sqrt(c))
      if (c == 0.0) 2.0 * omega * WgsAKm
      else {
        val r  = math.sqrt(s * c) / omega
        val d  = 2.0 * omega * WgsAKm
        val h1 = (3.0 * r - 1.0) / (2.0 * c)
        val h2 = (3.0 * r + 1.0) / (2.0 * s)
        d * (1.0 + WgsF * (h1 * sinF * sinF * cosG * cosG - h2 * cosF * cosF * sinG * sinG))
      }
    }
  }

  /** Spherical polygon area by the Chamberlain-Duquette discrete formula
    * (NASA JPL Publication 07-03; the formula turf.js ships): per ring,
    * Σ (λ₂−λ₁)·(2 + sin φ₁ + sin φ₂) over consecutive vertices, area =
    * |Σ|·R²/2 on the WGS84 equatorial sphere. Exterior minus holes,
    * summed over polygon components; non-areal geometries are 0. Term
    * order follows ring storage order (the oracle replays the identical
    * left-associated sum).
    */
  def geodesicAreaKm2(g: Geometry): Double = {
    def ringTotal(cs: Array[Coordinate]): Double = {
      var total = 0.0
      var i = 1
      while (i < cs.length) {
        total += (math.toRadians(cs(i).x) - math.toRadians(cs(i - 1).x)) *
          (2.0 + math.sin(math.toRadians(cs(i - 1).y)) + math.sin(math.toRadians(cs(i).y)))
        i += 1
      }
      // Mercator.RadiusM is the EXACT double 6378137.0 — (WgsAKm * 1000.0)
      // could differ in the last ulp from the oracle's literal
      math.abs(total) * Mercator.RadiusM * Mercator.RadiusM / 2.0
    }
    def polyArea(p: org.locationtech.jts.geom.Polygon): Double =
      ringTotal(p.getExteriorRing.getCoordinates) -
        (0 until p.getNumInteriorRing)
          .map(i => ringTotal(p.getInteriorRingN(i).getCoordinates)).sum
    val m2 = (0 until g.getNumGeometries).map(g.getGeometryN).collect {
      case p: org.locationtech.jts.geom.Polygon => polyArea(p)
    }.sum
    m2 / 1e6
  }

  /** Initial great-circle bearing (forward azimuth) from point 1 to point
    * 2, degrees in [0, 360): the standard
    * atan2(sin Δλ cos φ₂, cos φ₁ sin φ₂ − sin φ₁ cos φ₂ cos Δλ) form.
    */
  def bearingDeg(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val phi1 = math.toRadians(lat1); val phi2 = math.toRadians(lat2)
    val dl = math.toRadians(lon2) - math.toRadians(lon1)
    val theta = math.atan2(math.sin(dl) * math.cos(phi2),
      math.cos(phi1) * math.sin(phi2) - math.sin(phi1) * math.cos(phi2) * math.cos(dl))
    (math.toDegrees(theta) + 360.0) % 360.0
  }

  /** Ellipsoidal segment-sum along a geometry's coordinates — the geodesic
    * upgrade of [[lengthKm]] (closes the sphere-vs-WGS84 ~0.3% gap noted
    * there).
    */
  def geodesicLengthKm(g: Geometry): Double = {
    val cs = g.getCoordinates
    var sum = 0.0
    var i = 1
    while (i < cs.length) {
      sum += geodesicKm(cs(i - 1).x, cs(i - 1).y, cs(i).x, cs(i).y)
      i += 1
    }
    sum
  }
}
