package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.st
import graft.osm.OsmImport
import graft.sources.Shapefile
import graft.engine.{GeoFrame, SpatialProcedures}
import graft.geom.GeomCodec

/** OSM / shapefile ingestion against the reference's example-data fixtures
  * (read-only at /root/reference/example-data). Expected values mirror the
  * reference's own golden tests (TestOSMImportBase.checkOSMLayer, TestSpatial).
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val osmFixture = "/root/reference/example-data/osm/example.osm"
  private val shpFixture = "/root/reference/example-data/shp/highway.shp"

  test("OSM parse stages nodes/ways/tags") {
    val st8 = OsmImport.parse(spark, osmFixture)
    assert(st8.nodes.count() == 8)
    assert(st8.ways.count() == 1)
    assert(st8.wayNds.count() == 8)
    val tags = st8.tags.as[(String, Long, String, String)].collect()
    assert(tags.contains(("way", 72090582L, "highway", "residential")))
    assert(tags.contains(("way", 72090582L, "name", "Nybrodalsvägen")))
  }

  test("multi-shard OSM staging equals the single-file parse (overlapping boundary nodes dedup)") {
    val hdr = """<?xml version="1.0" encoding="UTF-8"?>""" + "\n" +
      """<osm version="0.6" generator="graft-test">""" + "\n"
    def node(id: Int, lat: Double, lon: Double) =
      s"""  <node id="$id" lat="$lat" lon="$lon" version="1" changeset="9" uid="3" user="u" timestamp="2020-01-01T00:00:00Z"/>""" + "\n"
    def way(id: Int, nds: Seq[Int], tag: (String, String)) =
      s"""  <way id="$id" version="1" changeset="9" timestamp="2020-01-01T00:00:00Z">""" + "\n" +
        nds.map(n => s"""    <nd ref="$n"/>""").mkString("\n") + "\n" +
        s"""    <tag k="${tag._1}" v="${tag._2}"/>""" + "\n  </way>\n"
    val n = (1 to 9).map(i => node(i, 10.0 + i * 0.1, 20.0 + i * 0.1))
    val w1 = way(101, Seq(1, 2, 3), "highway" -> "residential")
    val w2 = way(102, Seq(3, 4, 5), "highway" -> "path")
    val w3 = way(103, Seq(5, 6, 7, 8, 9), "highway" -> "track")
    // shards overlap on boundary nodes 3 and 5, like area-split extracts
    val shards = Seq(
      hdr + n.slice(0, 3).mkString + w1 + "</osm>\n",
      hdr + n.slice(2, 5).mkString + w2 + "</osm>\n",
      hdr + n.slice(4, 9).mkString + w3 + "</osm>\n")
    val single = hdr + n.mkString + w1 + w2 + w3 + "</osm>\n"
    val dir = Files.createTempDirectory("graft-osm-shards")
    shards.zipWithIndex.foreach { case (s, i) =>
      Files.writeString(dir.resolve(f"shard-$i%02d.osm"), s)
    }
    val singlePath = Files.createTempDirectory("graft-osm-single").resolve("all.osm")
    Files.writeString(singlePath, single)

    val sharded = OsmImport.parseShards(spark, dir.toString)
    val whole = OsmImport.parse(spark, singlePath.toString)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    assert(rows(sharded.nodes) == rows(whole.nodes))
    assert(rows(sharded.ways) == rows(whole.ways))
    assert(rows(sharded.wayNds) == rows(whole.wayNds))
    assert(rows(sharded.tags) == rows(whole.tags))
    // assembled geometry layer identical through either staging
    val a = OsmImport.assembleWays(sharded)
      .select(col("way_id"), st.asText(col("geometry")).as("wkt"))
    val b = OsmImport.assembleWays(whole)
      .select(col("way_id"), st.asText(col("geometry")).as("wkt"))
    assert(rows(a) == rows(b) && a.count() == 3)
  }

  test("OSM way assembly builds a LineString within the fixture bbox") {
    val ways = OsmImport.assembleWays(OsmImport.parse(spark, osmFixture))
    assert(ways.count() == 1)
    val row = ways.head()
    val g = GeomCodec.fromWkb(row.getAs[Array[Byte]]("geometry"))
    assert(g.getGeometryType == "LineString")
    assert(g.getNumPoints == 8)
    // fixture bounds: lon 12.93..13.01, lat 56.04..56.08
    val env = g.getEnvelopeInternal
    assert(env.getMinX > 12.9 && env.getMaxX < 13.02)
    assert(env.getMinY > 56.0 && env.getMaxY < 56.08)
    val props = row.getAs[Map[String, String]]("props")
    assert(props("highway") == "residential")
  }

  test("OSM points layer carries node tags and coordinates") {
    val pts = OsmImport.assemblePoints(OsmImport.parse(spark, osmFixture))
    assert(pts.count() == 8)
    assert(pts.filter(col("x") > 12.9 && col("x") < 13.02).count() == 8)
  }

  test("OSM tag-filtered dynamic layer") {
    val ways = OsmImport.assembleWays(OsmImport.parse(spark, osmFixture))
    assert(OsmImport.tagFilteredLayer(ways, "highway", "*").count() == 1)
    assert(OsmImport.tagFilteredLayer(ways, "highway", "residential").count() == 1)
    assert(OsmImport.tagFilteredLayer(ways, "highway", "motorway").count() == 0)
  }

  test("way geometry rules: closed ring becomes polygon") {
    val poly = OsmImport.buildWayGeometry(Seq(0, 1, 1, 0, 0), Seq(0, 0, 1, 1, 0))
    assert(poly.getGeometryType == "Polygon")
    val line = OsmImport.buildWayGeometry(Seq(0, 1, 2), Seq(0, 0, 0))
    assert(line.getGeometryType == "LineString")
    assert(OsmImport.buildWayGeometry(Seq.empty, Seq.empty) == null)
  }

  test("OSM golden import: reference model-integrity invariants on example.osm") {
    // mirrors the reference's checkOSMLayer assertions (reference:
    // TestOSMImportBase.checkOSMLayer:79 — index count == feature count;
    // TestSpatial.java:96-130 — specific way geometries by node order)
    val st8 = OsmImport.parse(spark, osmFixture)
    val ways = OsmImport.assembleWays(st8)
    // index count == feature count: every parsed way whose nds all resolve
    // is exactly one indexed feature
    assert(ways.count() == st8.ways.count())
    // the single way's linestring follows the nd order EXACTLY: first nd is
    // node 371662020 (lon 12.9639158, lat 56.0709040), last is node
    // 857081523 (lon 12.9680173, lat 56.0704885)
    val g = GeomCodec.fromWkb(ways.head().getAs[Array[Byte]]("geometry"))
    val cs = g.getCoordinates
    assert(cs.length == 8)
    assert(math.abs(cs.head.x - 12.9639158) < 1e-9 && math.abs(cs.head.y - 56.0709040) < 1e-9)
    assert(math.abs(cs.last.x - 12.9680173) < 1e-9 && math.abs(cs.last.y - 56.0704885) < 1e-9)
    // road enrichment: residential way with no oneway tag ⇒ BOTH
    val dir = OsmImport.withRoadDirection(ways).select("road_direction").head().getString(0)
    assert(dir == "BOTH")
    // all 8 nodes become point features with matching coordinates
    val pts = OsmImport.assemblePoints(st8)
    assert(pts.count() == 8)
    val p0 = pts.filter(col("node_id") === 371662020L).select("x", "y").head()
    assert(math.abs(p0.getDouble(0) - 12.9639158) < 1e-9 && math.abs(p0.getDouble(1) - 56.0709040) < 1e-9)
  }

  test("OSM changesets layer aggregates counts, user and bbox per changeset") {
    val st8 = OsmImport.parse(spark, osmFixture)
    val cs = OsmImport.assembleChangesets(st8)
      .orderBy("changeset")
      .collect()
    assert(cs.length == 2)
    val grillo = cs(0)
    assert(grillo.getAs[Long]("changeset") == 5465617L)
    assert(grillo.getAs[String]("user") == "Grillo")
    assert(grillo.getAs[Long]("n_nodes") == 1L && grillo.getAs[Long]("n_ways") == 0L)
    val craig = cs(1)
    assert(craig.getAs[Long]("changeset") == 5474347L)
    assert(craig.getAs[String]("user") == "Craig Taverner")
    assert(craig.getAs[Long]("n_nodes") == 7L && craig.getAs[Long]("n_ways") == 1L)
    val bb = craig.getAs[org.apache.spark.sql.Row]("bbox")
    assert(bb.getDouble(0) >= 12.96 && bb.getDouble(2) <= 12.97)  // lon span of the 7 nodes
  }

  test("ways with unresolvable nd refs are dropped, not fabricated") {
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\"?>\n<osm version=\"0.6\">\n"
    sb ++= " <node id=\"1\" lat=\"1.0\" lon=\"1.0\" version=\"1\"/>\n"
    sb ++= " <node id=\"2\" lat=\"2.0\" lon=\"2.0\" version=\"1\"/>\n"
    // way 10: all refs resolve; way 11: ref 99 missing (partial); way 12: all missing
    sb ++= " <way id=\"10\" version=\"1\"><nd ref=\"1\"/><nd ref=\"2\"/></way>\n"
    sb ++= " <way id=\"11\" version=\"1\"><nd ref=\"1\"/><nd ref=\"99\"/></way>\n"
    sb ++= " <way id=\"12\" version=\"1\"><nd ref=\"98\"/><nd ref=\"99\"/></way>\n"
    sb ++= "</osm>\n"
    val p = Files.createTempFile("graft-badrefs", ".osm")
    Files.writeString(p, sb.toString)
    val ways = OsmImport.assembleWays(OsmImport.parse(spark, p.toString))
    val ids = ways.select("way_id").as[Long].collect().toSet
    assert(ids == Set(10L), s"expected only the fully-resolved way, got $ids")
  }

  test("shapefile reader parses highway.shp geometry + dbf attributes") {
    val layer = Shapefile.importShapefile(spark, shpFixture)
    val n = layer.count()
    assert(n == 143, s"expected 143 records, got $n") // (shx 1244 - 100) / 8
    val types = layer.df.select("gtype").distinct().as[Int].collect().toSet
    assert(types.subsetOf(Set(GeomCodec.GTYPE_LINESTRING, GeomCodec.GTYPE_MULTILINESTRING)))
    // dbf attributes discovered
    val props = layer.df.select("props").head().getAs[Map[String, String]](0)
    assert(props.nonEmpty)
    // all geometries inside the fixture region (southern Sweden)
    val bb = layer.boundingBox().head()
    assert(bb.getDouble(0) > 12 && bb.getDouble(2) < 14)
    assert(bb.getDouble(1) > 55 && bb.getDouble(3) < 57)
  }

  test("shapefile export/import roundtrip") {
    val dir = Files.createTempDirectory("graft-shp").toString
    val src = Seq(
      ("a", "LINESTRING (12.95 56.05, 12.96 56.06)", Map("name" -> "road-a")),
      ("b", "LINESTRING (12.97 56.07, 12.98 56.08)", Map("name" -> "road-b")))
      .toDF("id", "wkt", "props")
      .withColumn("geometry", graft.functions.st.geomFromText(col("wkt")))
    Shapefile.exportShapefile(src, s"$dir/out")
    val back = Shapefile.importShapefile(spark, s"$dir/out.shp")
    assert(back.count() == 2)
    val props = back.df.orderBy("id").select("props").as[Map[String, String]].collect()
    assert(props(0)("name") == "road-a")
    val g = GeomCodec.fromWkb(back.df.orderBy("id").select("geometry").head().getAs[Array[Byte]](0))
    assert(g.getGeometryType == "LineString")
  }

  test("procedures facade: end-to-end layer lifecycle") {
    val wh = Files.createTempDirectory("graft-proc").toString
    val proc = new SpatialProcedures(spark, wh)
    // addPointLayer + addWKT + withinDistance — the reference's canonical
    // smoke flow (SpatialProceduresTest.add_node_and_search_bbox_and_distance)
    val src = Seq((1L, 15.0, 60.0)).toDF("k", "lon", "lat")
    proc.addPointLayerXY("geom", src, "k", "lon", "lat")
    assert(proc.layers().as[String].collect().toSeq == Seq("geom"))
    assert(proc.getFeatureCount("geom") == 1)
    val hits = proc.withinDistance("geom", 15.0, 60.0, 100.0)
    assert(hits.count() == 1)
    assert(hits.select("distance").as[Double].head() == 0.0)
    val none = proc.withinDistance("geom", 15.0, 50.0, 100.0)
    assert(none.count() == 0)
    val bb = proc.bbox("geom", 14.8, 59.8, 15.2, 60.2)
    assert(bb.count() == 1)
    proc.removeLayer("geom")
    assert(proc.layers().count() == 0)
    // WKT layer + intersects + cql + closest
    val wktSrc = Seq(("w1", "LINESTRING (15.1 60.1, 15.2 60.2)"),
      ("w2", "POINT (16 61)")).toDF("k", "wkt")
    proc.addWKTLayer("wl", wktSrc, "k", "wkt")
    assert(proc.intersects("wl", "POLYGON ((15 60, 15.3 60, 15.3 60.3, 15 60.3, 15 60))").count() == 1)
    assert(proc.cql("wl", "gtype = 1").count() == 1)
    val added = proc.addWKTs("wl", Seq("POINT (15.15 60.15)"))
    assert(added == 1 && proc.getFeatureCount("wl") == 3)
    val removed = proc.removeNodes("wl", Seq("w2"))
    assert(removed == 1 && proc.getFeatureCount("wl") == 2)
    assert(proc.wktToGeoJson("POINT (1 2)") == """{"type":"Point","coordinates":[1,2]}""")
  }

  test("procedures facade: importShapefile + importOSM register layers") {
    val wh = Files.createTempDirectory("graft-proc2").toString
    val proc = new SpatialProcedures(spark, wh)
    proc.importShapefile("highway", shpFixture)
    assert(proc.getFeatureCount("highway") == 143)
    proc.importOSM("osm_ways", osmFixture)
    assert(proc.getFeatureCount("osm_ways") == 1)
    assert(proc.layers().as[String].collect().toSet == Set("highway", "osm_ways"))
  }

  test("GeoJSON: FeatureCollection and GeoJSONSeq layouts parse to identical layers") {
    val dir = Files.createTempDirectory("graft-gjspec").toString
    // polygon WITH hole + a point + a linestring, heterogeneous in one set
    val features = Seq(
      """{"type": "Feature", "geometry": {"type": "Polygon", "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], [[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]]]}, "properties": {"fid": "1", "kind": "poly"}}""",
      """{"type": "Feature", "geometry": {"type": "Point", "coordinates": [5.5, -3.25]}, "properties": {"fid": "2", "kind": "pt"}}""",
      """{"type": "Feature", "geometry": {"type": "LineString", "coordinates": [[0, 0], [3, 4]]}, "properties": {"fid": "3", "kind": "ln"}}""")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/f.geojsonl"),
      features.mkString("\n"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/f.geojson"),
      features.mkString("""{"type": "FeatureCollection", "features": [""", ",\n", "]}"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), col("gtype"),
        graft.functions.st.asText(col("geometry")).as("wkt"),
        col("props").getItem("kind").as("kind"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))
      .sortBy(_._1).toSeq
    val seq = canon(graft.sources.GeoJsonSource.readGeoJsonSeq(spark,
      s"$dir/f.geojsonl", "fid"))
    val coll = canon(graft.sources.GeoJsonSource.readFeatureCollection(spark,
      s"$dir/f.geojson", "fid"))
    assert(seq == coll)
    assert(seq.map(_._1) == Seq("1", "2", "3"))
    assert(seq.map(_._2) == Seq(GeomCodec.GTYPE_POLYGON, GeomCodec.GTYPE_POINT,
      GeomCodec.GTYPE_LINESTRING))
    assert(seq.head._3.contains("2 2"), "polygon hole lost")   // interior ring survives
    // export → re-import round trip preserves everything
    val layer = graft.sources.GeoJsonSource.readGeoJsonSeq(spark,
      s"$dir/f.geojsonl", "fid")
    graft.sources.GeoJsonSource.exportGeoJsonSeq(layer, s"$dir/rt")
    val rt = canon(graft.sources.GeoJsonSource.readGeoJsonSeq(spark, s"$dir/rt", "fid"))
    assert(rt == seq)
    // facade parity: importGeoJson lands a queryable catalog layer
    val proc = new SpatialProcedures(spark,
      Files.createTempDirectory("graft-gjwh").toString)
    proc.importGeoJson("gj", s"$dir/f.geojsonl", idProp = "fid")
    assert(proc.getFeatureCount("gj") == 3)
    assert(proc.layer("gj").intersectsWindow(-10, -10, 20, 20).count() == 3)
  }
}
