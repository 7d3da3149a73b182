package graft.geom

import org.locationtech.jts.geom._
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}

/** Geometry storage codec: WKB (canonical column encoding) + WKT (API edge).
  *
  * Mirrors the reference's encoder layer
  * (reference: api/.../encoder/GeometryEncoder.java:53-118) but as a pure
  * value codec: geometries live in DataFrames as WKB `BinaryType` columns and
  * are deserialized only inside functions. JTS objects never enter a Dataset.
  *
  * JTS readers/writers are NOT thread-safe; Spark local[N] runs N task
  * threads in one JVM, so every accessor is a ThreadLocal.
  */
object GeomCodec {
  val factory = new GeometryFactory(new PrecisionModel(), 4326)

  private val wkbReader = ThreadLocal.withInitial[WKBReader](() => new WKBReader(factory))
  private val wkbWriter = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(2))
  private val wkbWriter3 = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(3))
  private val wktReader = ThreadLocal.withInitial[WKTReader](() => new WKTReader(factory))
  private val wktWriter = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter(2))
  private val wktWriter3 = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter(3))

  /** A geometry carries z when any coordinate's z is set (non-NaN) — the
    * reference stores z only for its 3D CRS layers
    * (reference: SimpleGraphEncoder.java:46, 3D codes Constants.java:74-75).
    */
  def hasZ(g: Geometry): Boolean = {
    val cs = g.getCoordinates
    var i = 0
    while (i < cs.length) {
      if (!cs(i).z.isNaN) return true
      i += 1
    }
    false
  }

  def fromWkb(bytes: Array[Byte]): Geometry = wkbReader.get.read(bytes)
  /** Dimension-aware: 2D geometries stay 2-coord WKB; z survives when present. */
  def toWkb(g: Geometry): Array[Byte] =
    if (hasZ(g)) wkbWriter3.get.write(g) else wkbWriter.get.write(g)
  def fromWkt(wkt: String): Geometry = wktReader.get.read(wkt)
  def toWkt(g: Geometry): String =
    if (hasZ(g)) wktWriter3.get.write(g) else wktWriter.get.write(g)

  def point(x: Double, y: Double): Point = factory.createPoint(new Coordinate(x, y))
  def point(x: Double, y: Double, z: Double): Point =
    factory.createPoint(new Coordinate(x, y, z))

  /** Geometry type codes, identical to the reference
    * (reference: server-plugin/.../Constants.java:66-72).
    */
  val GTYPE_GEOMETRY = 0
  val GTYPE_POINT = 1
  val GTYPE_LINESTRING = 2
  val GTYPE_POLYGON = 3
  val GTYPE_MULTIPOINT = 4
  val GTYPE_MULTILINESTRING = 5
  val GTYPE_MULTIPOLYGON = 6

  /** JTS class → gtype code; GeometryCollection deliberately falls through to
    * GTYPE_GEOMETRY (reference: SpatialDatabaseService.java:109-144).
    */
  def gtypeOf(g: Geometry): Int = g match {
    case _: Point           => GTYPE_POINT
    case _: LineString      => GTYPE_LINESTRING
    case _: Polygon         => GTYPE_POLYGON
    case _: MultiPoint      => GTYPE_MULTIPOINT
    case _: MultiLineString => GTYPE_MULTILINESTRING
    case _: MultiPolygon    => GTYPE_MULTIPOLYGON
    case _                  => GTYPE_GEOMETRY
  }

  def gtypeName(gtype: Int): String = gtype match {
    case GTYPE_POINT           => "Point"
    case GTYPE_LINESTRING      => "LineString"
    case GTYPE_POLYGON         => "Polygon"
    case GTYPE_MULTIPOINT      => "MultiPoint"
    case GTYPE_MULTILINESTRING => "MultiLineString"
    case GTYPE_MULTIPOLYGON    => "MultiPolygon"
    case _                     => "Geometry"
  }

  /** bbox as (minx, miny, maxx, maxy) — the searchable-envelope property the
    * reference stores on every indexed node
    * (reference: server-plugin/.../AbstractGeometryEncoder.java:64-81).
    */
  def bboxOf(g: Geometry): (Double, Double, Double, Double) = {
    val e = g.getEnvelopeInternal
    (e.getMinX, e.getMinY, e.getMaxX, e.getMaxY)
  }
}
