package graft.geom

import org.locationtech.jts.geom._

/** Text serializers: GeoJSON / GML / KML, hand-rolled over JTS (the reference
  * delegates GeoJSON structure walking to its own GeoJsonUtils and GML/KML to
  * GeoTools encoders, which are unavailable here).
  *
  * GeoJSON structure mirrors the reference's recursive walk
  * (reference: server-plugin/.../utilities/GeoJsonUtils.java:41-90).
  * GML output follows the GML 2 simple-features profile the GeoTools encoder
  * emits for these types (reference: pipes/processing/GML.java:30-48);
  * KML follows the OGC KML 2.2 geometry elements
  * (reference: pipes/processing/KeyholeMarkupLanguage.java:32-55).
  */
object GeoOutput {

  private def num(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString

  // ---------------------------------------------------------------- GeoJSON

  def toGeoJson(g: Geometry): String = g match {
    case gc: GeometryCollection if g.getGeometryType == "GeometryCollection" =>
      val members = (0 until gc.getNumGeometries).map(i => toGeoJson(gc.getGeometryN(i)))
      s"""{"type":"GeometryCollection","geometries":[${members.mkString(",")}]}"""
    case _ =>
      s"""{"type":"${g.getGeometryType}","coordinates":${coords(g)}}"""
  }

  private def pt(c: Coordinate): String =
    if (java.lang.Double.isNaN(c.getZ)) s"[${num(c.x)},${num(c.y)}]"
    else s"[${num(c.x)},${num(c.y)},${num(c.getZ)}]"

  private def coords(g: Geometry): String = g match {
    case p: Point => pt(p.getCoordinate)
    case l: LineString => l.getCoordinates.map(pt).mkString("[", ",", "]")
    case p: Polygon =>
      val rings = Seq(p.getExteriorRing) ++ (0 until p.getNumInteriorRing).map(p.getInteriorRingN)
      rings.map(coords).mkString("[", ",", "]")
    case gc: GeometryCollection =>
      (0 until gc.getNumGeometries).map(i => coords(gc.getGeometryN(i))).mkString("[", ",", "]")
    case other => throw new IllegalArgumentException(s"Unsupported geometry type: ${other.getGeometryType}")
  }

  // ---------------------------------------------------------------- GML 2

  def toGml(g: Geometry): String = g match {
    case p: Point =>
      s"<gml:Point><gml:coordinates>${gmlCoords(Array(p.getCoordinate))}</gml:coordinates></gml:Point>"
    case l: LineString =>
      s"<gml:LineString><gml:coordinates>${gmlCoords(l.getCoordinates)}</gml:coordinates></gml:LineString>"
    case p: Polygon =>
      val outer = s"<gml:outerBoundaryIs><gml:LinearRing><gml:coordinates>${gmlCoords(p.getExteriorRing.getCoordinates)}</gml:coordinates></gml:LinearRing></gml:outerBoundaryIs>"
      val inner = (0 until p.getNumInteriorRing).map { i =>
        s"<gml:innerBoundaryIs><gml:LinearRing><gml:coordinates>${gmlCoords(p.getInteriorRingN(i).getCoordinates)}</gml:coordinates></gml:LinearRing></gml:innerBoundaryIs>"
      }.mkString
      s"<gml:Polygon>$outer$inner</gml:Polygon>"
    case mp: MultiPoint =>
      wrapMulti("MultiPoint", "pointMember", mp)
    case ml: MultiLineString =>
      wrapMulti("MultiLineString", "lineStringMember", ml)
    case mp: MultiPolygon =>
      wrapMulti("MultiPolygon", "polygonMember", mp)
    case gc: GeometryCollection =>
      wrapMulti("MultiGeometry", "geometryMember", gc)
  }

  private def wrapMulti(tag: String, member: String, gc: GeometryCollection): String = {
    val members = (0 until gc.getNumGeometries)
      .map(i => s"<gml:$member>${toGml(gc.getGeometryN(i))}</gml:$member>").mkString
    s"<gml:$tag>$members</gml:$tag>"
  }

  private def gmlCoords(cs: Array[Coordinate]): String =
    cs.map(c => s"${c.x},${c.y}").mkString(" ")

  // ---------------------------------------------------------------- KML 2.2

  def toKml(g: Geometry): String = g match {
    case p: Point =>
      s"<Point><coordinates>${kmlCoords(Array(p.getCoordinate))}</coordinates></Point>"
    case l: LineString =>
      s"<LineString><coordinates>${kmlCoords(l.getCoordinates)}</coordinates></LineString>"
    case p: Polygon =>
      val outer = s"<outerBoundaryIs><LinearRing><coordinates>${kmlCoords(p.getExteriorRing.getCoordinates)}</coordinates></LinearRing></outerBoundaryIs>"
      val inner = (0 until p.getNumInteriorRing).map { i =>
        s"<innerBoundaryIs><LinearRing><coordinates>${kmlCoords(p.getInteriorRingN(i).getCoordinates)}</coordinates></LinearRing></innerBoundaryIs>"
      }.mkString
      s"<Polygon>$outer$inner</Polygon>"
    case gc: GeometryCollection =>
      val members = (0 until gc.getNumGeometries).map(i => toKml(gc.getGeometryN(i))).mkString
      s"<MultiGeometry>$members</MultiGeometry>"
  }

  private def kmlCoords(cs: Array[Coordinate]): String =
    cs.map(c => s"${c.x},${c.y}").mkString(" ")
}
