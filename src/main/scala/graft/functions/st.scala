package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.simplify.{DouglasPeuckerSimplifier, TopologyPreservingSimplifier}
import org.locationtech.jts.densify.Densifier
import org.locationtech.jts.geom.util.AffineTransformation
import org.locationtech.jts.linearref.LocationIndexedLine

import graft.geom.{GeomCodec, GeoOutput, Orthodromic}

/** Column-level spatial function surface.
  *
  * Two tiers, per SURVEY §2.11:
  *  - HOT tier: pure `Column` arithmetic (orthodromic distance, bbox predicates) that
  *    stays inside whole-stage codegen and is pushdown-friendly — mirrors the
  *    reference's envelope pre-filters (reference: server-plugin/.../rtree/filter/
  *    AbstractSearchEnvelopeIntersection.java) without any UDF cost.
  *  - JTS tier: Scala UDFs over WKB `BinaryType` for the exact geometry ops
  *    (reference: server-plugin/.../pipes/processing/<Pipe>.java, each a single JTS call).
  *
  * Naming follows the de-facto `ST_*` convention so `oracleSql` parity reads
  * naturally.
  */
object st {

  // ------------------------------------------------------------------ HOT:
  // spherical law of cosines, R=6371, clamped — EXACT reference formula
  // (reference: pipes/processing/OrthodromicDistance.java:85-97). Spark's
  // trig functions codegen to java.lang.Math, so results bit-match the
  // reference JVM implementation.
  def orthodromicKm(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column =
    acos(least(
      sin(radians(lat1)) * sin(radians(lat2)) +
        cos(radians(lat1)) * cos(radians(lat2)) * cos(radians(lon2) - radians(lon1)),
      lit(1.0))) * lit(Orthodromic.EarthRadiusKm)

  /** bbox struct<minx,miny,maxx,maxy> intersects a constant window. */
  def bboxIntersects(bbox: Column, minx: Double, miny: Double, maxx: Double, maxy: Double): Column =
    bbox("minx") <= maxx && bbox("maxx") >= minx && bbox("miny") <= maxy && bbox("maxy") >= miny

  /** bboxIntersects for a longitude interval that may extend past ±180
    * (a geodesic search window near the antimeridian): splits the prune
    * into the two wrapped in-range intervals so in-radius rows on the far
    * side of lon ±180 are not silently dropped. Degenerates to the plain
    * single-interval prune when no wrap occurs.
    */
  def bboxIntersectsWrapped(bbox: Column, minx: Double, miny: Double,
      maxx: Double, maxy: Double): Column =
    if (maxx - minx >= 360.0)
      bboxIntersects(bbox, -180.0, miny, 180.0, maxy)
    else if (minx < -180.0)
      bboxIntersects(bbox, minx + 360.0, miny, 180.0, maxy) ||
        bboxIntersects(bbox, -180.0, miny, maxx, maxy)
    else if (maxx > 180.0)
      bboxIntersects(bbox, minx, miny, 180.0, maxy) ||
        bboxIntersects(bbox, -180.0, miny, maxx - 360.0, maxy)
    else bboxIntersects(bbox, minx, miny, maxx, maxy)

  /** Constant window fully contains the bbox (the INCLUDE_ALL fast path of
    * the reference's window search — reference: filter/SearchIntersectWindow.java:57-66).
    */
  def bboxContainedBy(bbox: Column, minx: Double, miny: Double, maxx: Double, maxy: Double): Column =
    bbox("minx") >= minx && bbox("maxx") <= maxx && bbox("miny") >= miny && bbox("maxy") <= maxy

  def bboxStruct(minx: Column, miny: Column, maxx: Column, maxy: Column): Column =
    struct(minx.as("minx"), miny.as("miny"), maxx.as("maxx"), maxy.as("maxy"))

  // HOT: spherical Web-Mercator (EPSG:3857) forward/inverse as pure Column
  // arithmetic — codegen'd, pushdown-friendly, bit-matching geom.Mercator
  // (Spark's log/tan/atan/exp codegen to java.lang.Math).
  def mercatorX(lon: Column): Column = radians(lon) * lit(graft.geom.Mercator.RadiusM)
  def mercatorY(lat: Column): Column =
    log(tan(lit(math.Pi / 4.0) + radians(lat) / lit(2.0))) * lit(graft.geom.Mercator.RadiusM)
  def mercatorLon(x: Column): Column = degrees(x / lit(graft.geom.Mercator.RadiusM))
  def mercatorLat(y: Column): Column =
    degrees(atan(exp(y / lit(graft.geom.Mercator.RadiusM))) * lit(2.0) - lit(math.Pi / 2.0))

  // ------------------------------------------------------- JTS scalar UDFs

  private def g1[R: scala.reflect.runtime.universe.TypeTag](f: Geometry => R) =
    udf((wkb: Array[Byte]) => if (wkb == null) null.asInstanceOf[R] else f(GeomCodec.fromWkb(wkb)))

  private def gg(f: Geometry => Geometry) =
    udf((wkb: Array[Byte]) => if (wkb == null) null else GeomCodec.toWkb(f(GeomCodec.fromWkb(wkb))))

  private def g2[R: scala.reflect.runtime.universe.TypeTag](f: (Geometry, Geometry) => R) =
    udf((a: Array[Byte], b: Array[Byte]) =>
      if (a == null || b == null) null.asInstanceOf[R]
      else f(GeomCodec.fromWkb(a), GeomCodec.fromWkb(b)))

  private def gg2(f: (Geometry, Geometry) => Geometry) =
    udf((a: Array[Byte], b: Array[Byte]) =>
      if (a == null || b == null) null
      else GeomCodec.toWkb(f(GeomCodec.fromWkb(a), GeomCodec.fromWkb(b))))

  // IO
  val geomFromText: Column => Column = c => udf((s: String) => if (s == null) null else GeomCodec.toWkb(GeomCodec.fromWkt(s))).apply(c)
  val asText: Column => Column = c => g1[String](GeomCodec.toWkt).apply(c)
  val asGeoJson: Column => Column = c => g1[String](GeoOutput.toGeoJson).apply(c)
  val geomFromGeoJson: Column => Column = c =>
    udf((s: String) => if (s == null) null else GeomCodec.toWkb(GeoOutput.fromGeoJson(s))).apply(c)
  val asGml: Column => Column = c => g1[String](GeoOutput.toGml).apply(c)
  val asKml: Column => Column = c => g1[String](GeoOutput.toKml).apply(c)
  def makePoint(x: Column, y: Column): Column =
    udf((x: Double, y: Double) => GeomCodec.toWkb(GeomCodec.point(x, y))).apply(x, y)

  /** Axis-aligned box polygon from corner columns — the envelope-geometry
    * constructor behind the reference's window searches
    * (reference: rtree/filter/AbstractSearchEnvelopeIntersection.java:30).
    */
  def makeBox(minx: Column, miny: Column, maxx: Column, maxy: Column): Column =
    udf((x0: Double, y0: Double, x1: Double, y1: Double) =>
      GeomCodec.toWkb(GeomCodec.factory.toGeometry(
        new org.locationtech.jts.geom.Envelope(x0, x1, y0, y1)))).apply(minx, miny, maxx, maxy)

  /** Two-point segment from coordinate columns. */
  def makeLine(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    udf((ax: Double, ay: Double, bx: Double, by: Double) =>
      GeomCodec.toWkb(GeomCodec.factory.createLineString(Array(
        new org.locationtech.jts.geom.Coordinate(ax, ay),
        new org.locationtech.jts.geom.Coordinate(bx, by))))).apply(x1, y1, x2, y2)

  // Scalar compute (reference: pipes/processing/<Name>.java:29-60 each)
  val area: Column => Column = c => g1[Double](_.getArea).apply(c)
  val length: Column => Column = c => g1[Double](_.getLength).apply(c)
  val dimension: Column => Column = c => g1[Int](_.getDimension).apply(c)
  val geometryType: Column => Column = c => g1[String](_.getGeometryType).apply(c)
  val numPoints: Column => Column = c => g1[Int](_.getNumPoints).apply(c)
  val numGeometries: Column => Column = c => g1[Int](_.getNumGeometries).apply(c)
  val isEmpty: Column => Column = c => g1[Boolean](_.isEmpty).apply(c)
  val isValid: Column => Column = c => g1[Boolean](_.isValid).apply(c)
  val isSimple: Column => Column = c => g1[Boolean](_.isSimple).apply(c)
  val x: Column => Column = c => g1[Double](g => g.getCoordinate.x).apply(c)
  val y: Column => Column = c => g1[Double](g => g.getCoordinate.y).apply(c)
  /** z ordinate (NaN for 2D geometries) — 3D layers per
    * reference: SimpleGraphEncoder.java:46, Constants.java:74-75. */
  val z: Column => Column = c => g1[Double](g => g.getCoordinate.z).apply(c)

  def makePointZ(x: Column, y: Column, z: Column): Column =
    udf((x: Double, y: Double, z: Double) => GeomCodec.toWkb(GeomCodec.point(x, y, z)))
      .apply(x, y, z)

  // Geometry→geometry transforms
  val centroid: Column => Column = c => gg(_.getCentroid).apply(c)
  val interiorPoint: Column => Column = c => gg(_.getInteriorPoint).apply(c)
  val envelope: Column => Column = c => gg(_.getEnvelope).apply(c)
  val boundary: Column => Column = c => gg(_.getBoundary).apply(c)
  val convexHull: Column => Column = c => gg(_.convexHull).apply(c)
  val startPoint: Column => Column = c => gg(g => g.getFactory.createPoint(g.getCoordinates.head)).apply(c)
  val endPoint: Column => Column = c => gg(g => g.getFactory.createPoint(g.getCoordinates.last)).apply(c)
  val reverse: Column => Column = c => gg(_.reverse).apply(c)
  val normalize: Column => Column = c => gg { g => val n = g.copy(); n.normalize(); n }.apply(c)
  def buffer(c: Column, dist: Column): Column =
    udf((wkb: Array[Byte], d: Double) => if (wkb == null) null else GeomCodec.toWkb(GeomCodec.fromWkb(wkb).buffer(d))).apply(c, dist)
  def simplify(c: Column, tol: Column): Column =
    udf((wkb: Array[Byte], t: Double) => if (wkb == null) null else GeomCodec.toWkb(DouglasPeuckerSimplifier.simplify(GeomCodec.fromWkb(wkb), t))).apply(c, tol)
  def simplifyPreserveTopology(c: Column, tol: Column): Column =
    udf((wkb: Array[Byte], t: Double) => if (wkb == null) null else GeomCodec.toWkb(TopologyPreservingSimplifier.simplify(GeomCodec.fromWkb(wkb), t))).apply(c, tol)
  def densify(c: Column, tol: Column): Column =
    udf((wkb: Array[Byte], t: Double) => if (wkb == null) null else GeomCodec.toWkb(Densifier.densify(GeomCodec.fromWkb(wkb), t))).apply(c, tol)

  /** Affine transform with the 6-element matrix (m00,m01,m02,m10,m11,m12)
    * (reference: pipes/processing/ApplyAffineTransformation.java:30-55).
    */
  def affine(c: Column, m00: Double, m01: Double, m02: Double, m10: Double, m11: Double, m12: Double): Column =
    gg(g => new AffineTransformation(m00, m01, m02, m10, m11, m12).transform(g)).apply(c)

  // Binary geometry ops
  val union: (Column, Column) => Column = (a, b) => gg2(_.union(_)).apply(a, b)
  val intersection: (Column, Column) => Column = (a, b) => gg2(_.intersection(_)).apply(a, b)
  val difference: (Column, Column) => Column = (a, b) => gg2(_.difference(_)).apply(a, b)
  val symDifference: (Column, Column) => Column = (a, b) => gg2(_.symDifference(_)).apply(a, b)
  // named so BboxConjunctRule can derive the expanded-envelope conjunct for
  // `st.distance(geom, lit) <= d` range filters
  val distance: (Column, Column) => Column =
    (a, b) => g2[Double](_.distance(_)).withName("st_distance").apply(a, b)

  // Predicates (reference: pipes/filtering/Filter*.java, one JTS call each).
  // Each carries its st_* name so BboxConjunctRule recognizes Column-API
  // calls too (an anonymous ScalaUDF is invisible to the optimizer rule).
  private def g2pred(name: String)(f: (Geometry, Geometry) => Boolean): (Column, Column) => Column =
    (a, b) => g2[Boolean](f).withName(name).apply(a, b)
  val intersects: (Column, Column) => Column = g2pred("st_intersects")(_.intersects(_))
  val contains: (Column, Column) => Column = g2pred("st_contains")(_.contains(_))
  val within: (Column, Column) => Column = g2pred("st_within")(_.within(_))
  val covers: (Column, Column) => Column = g2pred("st_covers")(_.covers(_))
  val coveredBy: (Column, Column) => Column = g2pred("st_coveredby")(_.coveredBy(_))
  val crosses: (Column, Column) => Column = g2pred("st_crosses")(_.crosses(_))
  val overlaps: (Column, Column) => Column = g2pred("st_overlaps")(_.overlaps(_))
  val touches: (Column, Column) => Column = g2pred("st_touches")(_.touches(_))
  val disjoint: (Column, Column) => Column = g2pred("st_disjoint")(_.disjoint(_))
  val equalsTopo: (Column, Column) => Column = g2pred("st_equals")(_.equals(_))
  def equalsExact(a: Column, b: Column, tol: Column): Column =
    udf((x: Array[Byte], y: Array[Byte], t: Double) =>
      if (x == null || y == null) null.asInstanceOf[Boolean]
      else GeomCodec.fromWkb(x).equalsExact(GeomCodec.fromWkb(y), t)).apply(a, b, tol)
  def equalsNorm(a: Column, b: Column, tol: Column): Column =
    udf((x: Array[Byte], y: Array[Byte], t: Double) => {
      if (x == null || y == null) null.asInstanceOf[Boolean]
      else {
        val ga = GeomCodec.fromWkb(x); ga.normalize()
        val gb = GeomCodec.fromWkb(y); gb.normalize()
        ga.equalsExact(gb, t)
      }
    }).apply(a, b, tol)
  def relatePattern(a: Column, b: Column, pattern: Column): Column =
    udf((x: Array[Byte], y: Array[Byte], p: String) =>
      if (x == null || y == null) null.asInstanceOf[Boolean]
      else GeomCodec.fromWkb(x).relate(GeomCodec.fromWkb(y), p)).apply(a, b, pattern)
  val relate: (Column, Column) => Column = (a, b) => g2[String](_.relate(_).toString).apply(a, b)

  // Orthodromic (point-to-geometry; exact reference two-step for non-points)
  def orthodromicDistanceKm(c: Column, lon: Double, lat: Double): Column =
    g1[Double](g => Orthodromic.distanceToGeometryKm(lon, lat, g)).apply(c)
  val orthodromicLengthKm: Column => Column = c => g1[Double](Orthodromic.lengthKm).apply(c)

  /** Ellipsoidal (Andoyer-Lambert) segment-sum length — the geodesic upgrade
    * of orthodromicLengthKm (reference: OrthodromicLength.java:34-74 uses
    * GeoTools' ellipsoidal GeodeticCalculator; see Orthodromic.geodesicKm).
    */
  val geodesicLengthKm: Column => Column = c => g1[Double](Orthodromic.geodesicLengthKm).apply(c)

  /** Whole-geometry reprojection WGS84 → Web-Mercator meters (EPSG:3857). */
  val toMercator: Column => Column = c => gg(graft.geom.Mercator.toMercator).apply(c)

  /** Chamberlain-Duquette spherical polygon area (km²) — the geodesic
    * sibling of planar st_area (see Orthodromic.geodesicAreaKm2).
    */
  val geodesicAreaKm2: Column => Column = c => g1[Double](Orthodromic.geodesicAreaKm2).apply(c)

  /** Initial great-circle bearing (forward azimuth), degrees [0, 360) —
    * HOT-tier Column arithmetic mirroring Orthodromic.bearingDeg.
    */
  def bearingDeg(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val dl = radians(lon2) - radians(lon1)
    val theta = atan2(sin(dl) * cos(radians(lat2)),
      cos(radians(lat1)) * sin(radians(lat2)) -
        sin(radians(lat1)) * cos(radians(lat2)) * cos(dl))
    (degrees(theta) + lit(360.0)) % lit(360.0)
  }

  /** Spherical forward-geodesic destination (ST_Project): the point
    * `distKm` along the great circle from (lon, lat) at initial bearing
    * `bearing` degrees — the inverse problem of [[bearingDeg]] + orthodromic
    * distance, same R = 6371 sphere as Orthodromic. HOT-tier Column
    * arithmetic; returns a (lon, lat) struct in degrees with longitude
    * normalized to [-180, 180).
    */
  def projectPoint(lon: Column, lat: Column, bearing: Column,
      distKm: Column): Column = {
    val dlt = distKm / lit(graft.geom.Orthodromic.EarthRadiusKm)
    val th = radians(bearing)
    val la1 = radians(lat)
    val la2 = asin(sin(la1) * cos(dlt) + cos(la1) * sin(dlt) * cos(th))
    val lo2 = radians(lon) +
      atan2(sin(th) * sin(dlt) * cos(la1), cos(dlt) - sin(la1) * sin(la2))
    struct(((degrees(lo2) + lit(540.0)) % lit(360.0) - lit(180.0)).as("lon"),
      degrees(la2).as("lat"))
  }

  /** Closest point on geometry to a reference point + the snap distance —
    * the reference's `spatial.closest` edge-snapping
    * (reference: server-plugin/.../SpatialTopologyUtils.java:95-140, using
    * LocationIndexedLine.project/extractPoint for lineal geometries).
    */
  def closestPointTo(c: Column, lon: Double, lat: Double): Column =
    gg { g =>
      val p = new org.locationtech.jts.geom.Coordinate(lon, lat)
      g match {
        case l: org.locationtech.jts.geom.LineString =>
          val lil = new LocationIndexedLine(l)
          g.getFactory.createPoint(lil.extractPoint(lil.project(p)))
        case pt: org.locationtech.jts.geom.Point => pt
        case other =>
          val near = new org.locationtech.jts.operation.distance.DistanceOp(
            other.getFactory.createPoint(p), other).nearestPoints()
          other.getFactory.createPoint(near(1))
      }
    }.apply(c)

  // Generators: WKB arrays to explode()
  /** Every coordinate as a Point row (reference: pipes/processing/ExtractPoints.java:29-45). */
  val extractPoints: Column => Column =
    c => g1[Array[Array[Byte]]](g =>
      g.getCoordinates.map(cd => GeomCodec.toWkb(g.getFactory.createPoint(cd)))).apply(c)
  /** Members of a multi-geometry / collection (reference: pipes/processing/ExtractGeometries.java:28). */
  val extractGeometries: Column => Column =
    c => g1[Array[Array[Byte]]](g =>
      (0 until g.getNumGeometries).map(i => GeomCodec.toWkb(g.getGeometryN(i))).toArray).apply(c)

  /** bbox derivation from WKB — used at layer-build time. */
  val bboxOf: Column => Column = c =>
    udf((wkb: Array[Byte]) => {
      if (wkb == null) null
      else {
        val e = GeomCodec.fromWkb(wkb).getEnvelopeInternal
        (e.getMinX, e.getMinY, e.getMaxX, e.getMaxY)
      }
    }).apply(c).cast("struct<minx:double,miny:double,maxx:double,maxy:double>")

  val gtype: Column => Column = c => g1[Int](GeomCodec.gtypeOf).apply(c)
}
