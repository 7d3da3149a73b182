package graft.geom

import org.locationtech.jts.geom.{CoordinateFilter, Geometry}

/** Spherical Web-Mercator (EPSG:3857) forward/inverse transform — the one
  * CRS reprojection the reference's tile/export surface effectively assumes
  * beyond raw WGS84 (slippy-map tiling; reference exports lon/lat and lets
  * the client reproject). Spherical formula on the WGS84 semi-major axis,
  * exactly as EPSG:3857 defines it (not ellipsoidal 3395).
  *
  * Forward: x = R·λ, y = R·ln(tan(π/4 + φ/2)); inverse:
  * φ = 2·atan(exp(y/R)) − π/2. Pure elementary functions, so the transform
  * exists in three equivalent forms: this JVM version, a codegen'd Column
  * version (st.mercatorX/Y), and the DuckDB oracle replay.
  */
object Mercator {
  val RadiusM = 6378137.0

  def xM(lon: Double): Double = RadiusM * math.toRadians(lon)
  def yM(lat: Double): Double = RadiusM * math.log(math.tan(math.Pi / 4.0 + math.toRadians(lat) / 2.0))
  def lonDeg(x: Double): Double = math.toDegrees(x / RadiusM)
  def latDeg(y: Double): Double = math.toDegrees(2.0 * math.atan(math.exp(y / RadiusM)) - math.Pi / 2.0)

  /** In-place reprojection of every coordinate of a (cloned) geometry to
    * Web-Mercator meters. Planar ops on the result (length, area, buffers)
    * are then meter-denominated near the equator and scale by 1/cos(φ)
    * toward the poles — the standard slippy-map trade.
    */
  def toMercator(g: Geometry): Geometry = {
    val out = g.copy()
    out.apply(new CoordinateFilter {
      override def filter(c: org.locationtech.jts.geom.Coordinate): Unit = {
        val x = xM(c.x); val y = yM(c.y)
        c.x = x; c.y = y
      }
    })
    out.geometryChanged()
    out
  }
}
