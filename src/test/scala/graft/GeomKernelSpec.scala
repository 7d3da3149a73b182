package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.{GeomCodec, GeoOutput, Orthodromic}

/** Pure JTS-kernel tests (no Spark). */
class GeomKernelSpec extends AnyFunSuite {

  test("WKB/WKT codec roundtrip") {
    val wkts = Seq(
      "POINT (15.2 60.1)",
      "LINESTRING (12 56, 12.5 56.5, 14 57)",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))",
      "MULTIPOINT ((1 1), (2 2))",
      "MULTILINESTRING ((1 1, 2 2), (3 3, 4 4))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))")
    wkts.foreach { w =>
      val g = GeomCodec.fromWkt(w)
      val rt = GeomCodec.fromWkb(GeomCodec.toWkb(g))
      assert(rt.equalsExact(g), s"roundtrip failed for $w")
    }
  }

  test("gtype codes match reference Constants.java:66-72") {
    assert(GeomCodec.gtypeOf(GeomCodec.fromWkt("POINT (1 1)")) == 1)
    assert(GeomCodec.gtypeOf(GeomCodec.fromWkt("LINESTRING (1 1, 2 2)")) == 2)
    assert(GeomCodec.gtypeOf(GeomCodec.fromWkt("POLYGON ((0 0, 1 0, 1 1, 0 0))")) == 3)
    assert(GeomCodec.gtypeOf(GeomCodec.fromWkt("MULTIPOINT ((1 1))")) == 4)
    assert(GeomCodec.gtypeOf(GeomCodec.fromWkt("MULTILINESTRING ((1 1, 2 2))")) == 5)
    assert(GeomCodec.gtypeOf(GeomCodec.fromWkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))")) == 6)
    // GeometryCollection deliberately maps to generic GEOMETRY (=0)
    assert(GeomCodec.gtypeOf(GeomCodec.fromWkt("GEOMETRYCOLLECTION (POINT (1 1))")) == 0)
  }

  test("orthodromic distance reproduces the reference formula") {
    // 1 degree of latitude on the 6371 sphere: 6371 * pi/180
    val oneDegLat = Orthodromic.distanceKm(0, 0, 0, 1)
    assert(math.abs(oneDegLat - 6371.0 * math.Pi / 180) < 1e-9)
    // symmetric
    assert(Orthodromic.distanceKm(12, 56, 13, 57) == Orthodromic.distanceKm(13, 57, 12, 56))
    // zero distance, clamp path (acos arg exactly 1)
    assert(Orthodromic.distanceKm(10, 50, 10, 50) == 0.0)
    // known value: London (-0.1278, 51.5074) to Paris (2.3522, 48.8566) ≈ 343.5 km
    val lp = Orthodromic.distanceKm(-0.1278, 51.5074, 2.3522, 48.8566)
    assert(lp > 340 && lp < 348, s"london-paris $lp")
  }

  test("search window covers the exact geodesic ball longitude extent") {
    val w = Orthodromic.searchWindow(10, 60, 111.19)
    // EXACT extent asin(sin c / cos φ) — strictly wider than the
    // first-order c/cos φ compensation (which under-covers at high lat)
    val latHalf = (w.getMaxY - w.getMinY) / 2
    val lonHalf = (w.getMaxX - w.getMinX) / 2
    val c = 111.19 / 6371.0
    val exact = math.toDegrees(math.asin(math.sin(c) / math.cos(math.toRadians(60))))
    assert(math.abs(lonHalf - exact) < 1e-9)
    assert(lonHalf > latHalf / math.cos(math.toRadians(60)),
      "exact extent must dominate the first-order compensation")
  }

  test("orthodromic length sums segments") {
    val line = GeomCodec.fromWkt("LINESTRING (0 0, 0 1, 0 2)")
    assert(math.abs(Orthodromic.lengthKm(line) - 2 * 6371.0 * math.Pi / 180) < 1e-9)
  }

  test("GeoJSON structure matches reference GeoJsonUtils walk") {
    assert(GeoOutput.toGeoJson(GeomCodec.fromWkt("POINT (15.2 60.1)")) ==
      """{"type":"Point","coordinates":[15.2,60.1]}""")
    assert(GeoOutput.toGeoJson(GeomCodec.fromWkt("LINESTRING (1 2, 3 4)")) ==
      """{"type":"LineString","coordinates":[[1,2],[3,4]]}""")
    assert(GeoOutput.toGeoJson(GeomCodec.fromWkt("POLYGON ((0 0, 1 0, 1 1, 0 0))")) ==
      """{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,0]]]}""")
    assert(GeoOutput.toGeoJson(GeomCodec.fromWkt("GEOMETRYCOLLECTION (POINT (1 1))")) ==
      """{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":[1,1]}]}""")
  }

  test("GML and KML emit well-formed geometry elements") {
    val p = GeomCodec.fromWkt("POLYGON ((0 0, 1 0, 1 1, 0 0), (0.2 0.2, 0.4 0.2, 0.4 0.4, 0.2 0.2))")
    val gml = GeoOutput.toGml(p)
    assert(gml.startsWith("<gml:Polygon><gml:outerBoundaryIs>"))
    assert(gml.contains("<gml:innerBoundaryIs>"))
    val kml = GeoOutput.toKml(p)
    assert(kml.startsWith("<Polygon><outerBoundaryIs>"))
    assert(kml.contains("<innerBoundaryIs>"))
    assert(GeoOutput.toGml(GeomCodec.fromWkt("MULTIPOINT ((1 1), (2 2))"))
      .startsWith("<gml:MultiPoint><gml:pointMember>"))
  }

  test("bbox derivation") {
    val (minx, miny, maxx, maxy) = GeomCodec.bboxOf(GeomCodec.fromWkt("LINESTRING (1 5, 3 2)"))
    assert((minx, miny, maxx, maxy) == (1.0, 2.0, 3.0, 5.0))
  }
}
