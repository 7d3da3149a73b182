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
      (9, 20.0, 20.0), (10, 30.0, 20.0), (11, 30.0, 30.0))
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
    sb ++= """ <relation id="200" version="1">
              |  <member type="way" ref="100" role="outer"/>
              |  <member type="way" ref="101" role="inner"/>
              |  <tag k="type" v="multipolygon"/>
              | </relation>
              | <relation id="201" version="1">
              |  <member type="way" ref="102" role="outer"/>
              | </relation>
              |</osm>
              |""".stripMargin
    val p = Files.createTempFile("graft-rel", ".osm")
    Files.writeString(p, sb.toString)
    p.toString
  }

  test("relation assembly: polygon with hole; unclosed outer repaired") {
    val st8 = OsmImport.parse(spark, writeOsm())
    assert(st8.relations.count() == 2)
    assert(st8.members.count() == 3)
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

  test("relation tags land in props") {
    val st8 = OsmImport.parse(spark, writeOsm())
    val props = OsmImport.assembleRelations(st8)
      .filter(org.apache.spark.sql.functions.col("id") === "200")
      .head().getAs[Map[String, String]]("props")
    assert(props("type") == "multipolygon")
  }
}
