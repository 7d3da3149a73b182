package graft

import java.nio.file.{Files, Paths}
import graft.osm.OsmImport
import graft.geom.GeomCodec

/** Relation assembly (polygon with hole, ring repair) against a synthetic
  * OSM extract — the fixture example.osm has no relations, so expected
  * values mirror the reference's multipolygon decode rules
  * (reference: OSMGeometryEncoder.java:245-348).
  */
class OsmRelationSpec extends SparkSpec {

  private def writeOsm(): String = {
    // outer ring 0..10 square (closed way), inner ring 2..4 square (closed),
    // plus an UNCLOSED outer for the repair path in a second relation
    val nodes = Seq(
      (1, 0.0, 0.0), (2, 10.0, 0.0), (3, 10.0, 10.0), (4, 0.0, 10.0),
      (5, 2.0, 2.0), (6, 4.0, 2.0), (7, 4.0, 4.0), (8, 2.0, 4.0),
      (9, 20.0, 20.0), (10, 30.0, 20.0), (11, 30.0, 30.0),
      (12, 40.0, 40.0), (13, 44.0, 40.0), (14, 44.0, 44.0), (15, 40.0, 44.0))
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<osm version=\"0.6\">\n"
    nodes.foreach { case (id, lon, lat) =>
      sb ++= s""" <node id="$id" lat="$lat" lon="$lon" version="1"/>\n"""
    }
    def way(id: Int, nds: Seq[Int]): Unit = {
      sb ++= s""" <way id="$id" version="1">\n"""
      nds.foreach(n => sb ++= s"""  <nd ref="$n"/>\n""")
      sb ++= " </way>\n"
    }
    way(100, Seq(1, 2, 3, 4, 1))       // closed outer
    way(101, Seq(5, 6, 7, 8, 5))       // closed inner
    way(102, Seq(9, 10, 11))           // unclosed outer (repair)
    way(103, Seq(12, 13, 14, 15, 12))  // closed outer for the super-relation
    sb ++= """ <relation id="200" version="1">
              |  <member type="way" ref="100" role="outer"/>
              |  <member type="way" ref="101" role="inner"/>
              |  <tag k="type" v="multipolygon"/>
              | </relation>
              | <relation id="201" version="1">
              |  <member type="way" ref="102" role="outer"/>
              | </relation>
              | <relation id="300" version="1">
              |  <member type="relation" ref="200" role=""/>
              |  <member type="way" ref="103" role="outer"/>
              |  <tag k="type" v="multipolygon"/>
              | </relation>
              |</osm>
              |""".stripMargin
    val p = Files.createTempFile("graft-rel", ".osm")
    Files.writeString(p, sb.toString)
    p.toString
  }

  test("relation assembly: polygon with hole; unclosed outer repaired") {
    val st8 = OsmImport.parse(spark, writeOsm())
    assert(st8.relations.count() == 3)
    assert(st8.members.count() == 5)
    val rels = OsmImport.assembleRelations(st8)
      .collect().map(r => r.getAs[String]("id") ->
        GeomCodec.fromWkb(r.getAs[Array[Byte]]("geometry"))).toMap

    val withHole = rels("200")
    assert(withHole.getGeometryType == "Polygon")
    // outer 10x10 = 100 minus 2x2 hole = 96
    assert(math.abs(withHole.getArea - 96.0) < 1e-9)
    val poly = withHole.asInstanceOf[org.locationtech.jts.geom.Polygon]
    assert(poly.getNumInteriorRing == 1)

    val repaired = rels("201")
    assert(repaired.getGeometryType == "Polygon")
    // closed triangle (20,20)-(30,20)-(30,30): area 50
    assert(math.abs(repaired.getArea - 50.0) < 1e-9)
  }

  test("relation-of-relations resolves nested members recursively") {
    val st8 = OsmImport.parse(spark, writeOsm())
    val g = OsmImport.assembleRelations(st8)
      .filter(org.apache.spark.sql.functions.col("id") === "300")
      .head()
    val geom = GeomCodec.fromWkb(g.getAs[Array[Byte]]("geometry"))
    // relation 300 = relation 200 (10x10 outer with 2x2 hole, roles inherited
    // through the empty-role relation member) + its own 4x4 outer way
    assert(geom.getGeometryType == "MultiPolygon", geom.getGeometryType)
    assert(geom.getNumGeometries == 2)
    assert(math.abs(geom.getArea - (96.0 + 16.0)) < 1e-9, s"area=${geom.getArea}")
    val holed = (0 until 2).map(geom.getGeometryN(_).asInstanceOf[org.locationtech.jts.geom.Polygon])
      .map(_.getNumInteriorRing).max
    assert(holed == 1, "the nested 2x2 hole must survive recursion")
  }

  test("road direction decodes the oneway tag exactly like the reference") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, map}
    val rows = Seq(
      Map("highway" -> "primary", "oneway" -> "yes"),
      Map("highway" -> "primary", "oneway" -> "TRUE"),
      Map("highway" -> "primary", "oneway" -> "1"),
      Map("highway" -> "primary", "oneway" -> "-1"),
      Map("highway" -> "primary", "oneway" -> "no"),
      Map("highway" -> "primary"),
      Map("building" -> "yes", "oneway" -> "yes")  // not a road -> null
    ).toDF("props")
    val got = OsmImport.withRoadDirection(rows).select("road_direction")
      .as[Option[String]].collect().toSeq
    assert(got == Seq(Some("FORWARD"), Some("FORWARD"), Some("FORWARD"),
      Some("BACKWARD"), Some("BOTH"), Some("BOTH"), None))
  }

  test("golden OSM layer checks: index-count invariant + envelope searches") {
    // the analog of the reference's checkOSMLayer golden test
    // (reference: TestOSMImportBase.java:79-130): index count == feature
    // count, layer bbox exists, and within-searches around a way's envelope
    // (expanding 4x) always find it; searches around the layer centre grow
    // monotonically as the window doubles.
    import org.apache.spark.sql.functions.col
    val osmFixture = "/root/reference/example-data/osm/example.osm"
    val st8 = OsmImport.parse(spark, osmFixture)
    val layer = OsmImport.importOsm(spark, osmFixture)
    val featureCount = layer.count()
    assert(featureCount == st8.wayNds.select("way_id").distinct().count(),
      "every way with nodes must be indexed exactly once")

    val bb = layer.boundingBox().head()
    val (minx, miny, maxx, maxy) = (bb.getDouble(0), bb.getDouble(1), bb.getDouble(2), bb.getDouble(3))
    assert(minx < maxx && miny < maxy)

    val way = layer.df.orderBy(col("id")).head()
    val wb = way.getAs[org.apache.spark.sql.Row]("bbox")
    var (wminx, wminy, wmaxx, wmaxy) =
      (wb.getDouble(0), wb.getDouble(1), wb.getDouble(2), wb.getDouble(3))
    for (_ <- 1 to 4) {
      val hits = layer.intersectsWindow(wminx, wminy, wmaxx, wmaxy).count()
      assert(hits >= 1, "a way must be found by a search over its own envelope")
      val (w, h) = (wmaxx - wminx, wmaxy - wminy)
      wminx -= w; wmaxx += w; wminy -= h; wmaxy += h
    }

    val (cx, cy) = ((minx + maxx) / 2, (miny + maxy) / 2)
    var (hw, hh) = ((maxx - minx) / 100, (maxy - miny) / 100)
    var prev = -1L
    for (_ <- 1 to 4) {
      val hits = layer.intersectsWindow(cx - hw, cy - hh, cx + hw, cy + hh).count()
      assert(hits >= prev, "hits must grow with the window")
      prev = hits
      hw *= 2; hh *= 2
    }
    assert(prev <= featureCount)
  }

  test("relation tags land in props") {
    val st8 = OsmImport.parse(spark, writeOsm())
    val props = OsmImport.assembleRelations(st8)
      .filter(org.apache.spark.sql.functions.col("id") === "200")
      .head().getAs[Map[String, String]]("props")
    assert(props("type") == "multipolygon")
  }
}
