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

  /** GeoJSON → JTS parser (inverse of toGeoJson): a small recursive-descent
    * scan over the geometry subset of GeoJSON — no JSON library needed for
    * the fixed `{"type":…,"coordinates":…}` shape our writer and common
    * producers emit. Whitespace-tolerant; 2D/3D positions.
    */
  def fromGeoJson(s: String): Geometry = new GeoJsonParser(s).parseGeometry()

  private final class GeoJsonParser(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s.charAt(i) != c)
        throw new IllegalArgumentException(s"GeoJSON parse: expected '$c' at $i in $s")
      i += 1
    }
    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') i += 1
        sb.append(s.charAt(i)); i += 1
      }
      i += 1
      sb.toString
    }
    private def parseNumber(): Double = {
      ws()
      val start = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      s.substring(start, i).toDouble
    }
    private def peek(): Char = { ws(); s.charAt(i) }

    /** [x,y] or [x,y,z] */
    private def parsePosition(): Coordinate = {
      expect('[')
      val x = parseNumber()
      expect(',')
      val y = parseNumber()
      val c = if (peek() == ',') { i += 1; new Coordinate(x, y, parseNumber()) }
              else new Coordinate(x, y)
      expect(']')
      c
    }
    private def parseArrayOf[T](elem: () => T): Vector[T] = {
      expect('[')
      val out = Vector.newBuilder[T]
      if (peek() != ']') {
        out += elem()
        while (peek() == ',') { i += 1; out += elem() }
      }
      expect(']')
      out.result()
    }

    private val f = GeomCodec.factory

    def parseGeometry(): Geometry = {
      expect('{')
      var typ: String = null
      var geom: Geometry = null
      var coordsStart = -1
      var done = false
      while (!done) {
        val key = parseString()
        expect(':')
        key match {
          case "type" => typ = parseString()
          case "coordinates" =>
            // type may appear after coordinates; remember position and skip
            coordsStart = { ws(); i }
            skipValue()
          case "geometries" =>
            val members = parseArrayOf(() => parseGeometry())
            geom = f.createGeometryCollection(members.toArray)
          case _ => skipValue()
        }
        if (peek() == ',') i += 1 else { expect('}'); done = true }
      }
      if (typ == "GeometryCollection") geom
      else {
        require(typ != null && coordsStart >= 0, s"GeoJSON parse: missing type/coordinates in $s")
        val endPos = i // past this object's '}' — restore before returning
        i = coordsStart
        val g = typ match {
          case "Point" => f.createPoint(parsePosition())
          case "LineString" => f.createLineString(parseArrayOf(() => parsePosition()).toArray)
          case "Polygon" => polygonOf(parseArrayOf(() => parseArrayOf(() => parsePosition())))
          case "MultiPoint" =>
            f.createMultiPoint(parseArrayOf(() => parsePosition()).map(f.createPoint).toArray)
          case "MultiLineString" =>
            f.createMultiLineString(
              parseArrayOf(() => parseArrayOf(() => parsePosition())).map(cs => f.createLineString(cs.toArray)).toArray)
          case "MultiPolygon" =>
            f.createMultiPolygon(
              parseArrayOf(() => parseArrayOf(() => parseArrayOf(() => parsePosition()))).map(polygonOf).toArray)
          case other => throw new IllegalArgumentException(s"GeoJSON type $other not supported")
        }
        i = endPos
        g
      }
    }

    private def polygonOf(rings: Vector[Vector[Coordinate]]): Polygon = {
      val shell = f.createLinearRing(rings.head.toArray)
      val holes = rings.tail.map(r => f.createLinearRing(r.toArray)).toArray
      f.createPolygon(shell, holes)
    }

    /** Skip any JSON value (used for unknown keys and coordinate pre-scan). */
    private def skipValue(): Unit = {
      ws()
      s.charAt(i) match {
        case '{' =>
          var depth = 0
          do {
            s.charAt(i) match {
              case '{' | '[' => depth += 1
              case '}' | ']' => depth -= 1
              case '"' => i += 1; while (s.charAt(i) != '"') { if (s.charAt(i) == '\\') i += 1; i += 1 }
              case _ =>
            }
            i += 1
          } while (depth > 0)
        case '[' =>
          var depth = 0
          do {
            s.charAt(i) match {
              case '[' | '{' => depth += 1
              case ']' | '}' => depth -= 1
              case '"' => i += 1; while (s.charAt(i) != '"') { if (s.charAt(i) == '\\') i += 1; i += 1 }
              case _ =>
            }
            i += 1
          } while (depth > 0)
        case '"' => parseString()
        case _ => while (i < s.length && ",}]".indexOf(s.charAt(i)) < 0) i += 1
      }
    }
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
