package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.osm.{OsmImport, OsmPbf}

/** OSM PBF binary format: wire-codec primitives, write→parse roundtrip
  * equality with the XML staging path, multi-blob delta restarts.
  */
class PbfSpec extends SparkSpec {

  test("varint / zigzag primitives") {
    for (v <- Seq(0L, 1L, 127L, 128L, 300L, Long.MaxValue)) {
      val p = new OsmPbf.Pb; p.varint(v)
      assert(new OsmPbf.PbIn(p.toBytes).varint() == v)
    }
    for (v <- Seq(0L, -1L, 1L, -2L, 2L, Long.MinValue + 1, Long.MaxValue))
      assert(OsmPbf.unzigzag(OsmPbf.zigzag(v)) == v)
  }

  test("pbf write → parse roundtrips the staging tables exactly") {
    val nodes = (1L to 37L).map(i =>
      OsmPbf.PbfNode(i * 3, (i % 360) - 180 + 0.5, ((i * 7) % 180) - 90 + 0.5,
        tags = if (i % 5 == 0) Seq("amenity" -> "bench") else Nil))
    val ways = Seq(
      OsmPbf.PbfWay(900L, (1L to 12L).map(_ * 3), tags = Seq("highway" -> "path", "name" -> "w0")),
      OsmPbf.PbfWay(901L, (13L to 37L).map(_ * 3), tags = Seq("highway" -> "residential")))
    val tmp = Files.createTempFile("graft-pbf-spec", ".osm.pbf")
    tmp.toFile.deleteOnExit()
    // batch 10 → four node blobs + one way blob: cross-blob delta restarts
    OsmPbf.writePbf(tmp.toString, nodes, ways, batch = 10)
    val refs = OsmPbf.blobRefs(tmp.toString)
    assert(refs.count(_.blobType == "OSMHeader") == 1)
    assert(refs.count(_.blobType == "OSMData") == 5, refs.toString)

    val staging = OsmPbf.parsePbf(spark, tmp.toString)
    val gotNodes = staging.nodes.select("node_id", "lon", "lat", "version")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getInt(3))).toSet
    assert(gotNodes == nodes.map(n => (n.id, n.lon, n.lat, 1)).toSet)
    val gotNds = staging.wayNds.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(gotNds == ways.flatMap(w => w.refs.zipWithIndex.map { case (ref, i) => (w.id, i, ref) }).toSet)
    val gotTags = staging.tags.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    val wantTags =
      nodes.flatMap(n => n.tags.map(t => ("node", n.id, t._1, t._2))) ++
      ways.flatMap(w => w.tags.map(t => ("way", w.id, t._1, t._2)))
    assert(gotTags == wantTags.toSet)
  }

  test("plain (non-dense) Node groups decode too") {
    // hand-assemble a PrimitiveBlock with the `nodes = 1` plain encoding
    // (our writer emits DenseNodes; real-world files carry either)
    val st = new OsmPbf.Pb
    st.bytes(1, "".getBytes); st.bytes(1, "amenity".getBytes); st.bytes(1, "cafe".getBytes)
    val group = new OsmPbf.Pb
    for ((id, lon, lat, tagged) <- Seq((5L, 11.5, 47.5, true), (6L, -120.25, -33.75, false))) {
      val n = new OsmPbf.Pb
      n.sint(1, id)
      if (tagged) { n.packed(2, Seq(1L)); n.packed(3, Seq(2L)) }
      n.sint(8, math.round(lat * 1e9 / 100))
      n.sint(9, math.round(lon * 1e9 / 100))
      group.msg(1, n)
    }
    val block = new OsmPbf.Pb
    block.msg(1, st); block.msg(2, group); block.int(17, 100L)
    val payload = block.toBytes
    val blob = new OsmPbf.Pb
    blob.bytes(1, payload)
    val hdr = new OsmPbf.Pb
    hdr.string(1, "OSMData"); hdr.int(3, blob.toBytes.length.toLong)
    val out = new java.io.DataOutputStream(new java.io.FileOutputStream("/tmp/graft-plain-nodes.pbf"))
    out.writeInt(hdr.toBytes.length); out.write(hdr.toBytes); out.write(blob.toBytes); out.close()

    val raw = OsmPbf.decodeData(OsmPbf.blobRefs("/tmp/graft-plain-nodes.pbf").head)
    assert(raw.nodes.map(n => (n._1, n._3, n._2)).toSet ==
      Set((5L, 11.5, 47.5), (6L, -120.25, -33.75)))
    assert(raw.tags == Seq(("node", 5L, "amenity", "cafe")))
  }

  test("pbf staging equals xml staging on the same corpus") {
    val xml = new StringBuilder("<?xml version='1.0'?>\n<osm version='0.6'>\n")
    val nodes = (1L to 25L).map(i => (i, (i % 36) * 10.0 - 175.5, (i % 17) * 10.0 - 80.5))
    nodes.foreach { case (id, x, y) =>
      xml ++= s"  <node id='$id' lat='$y' lon='$x' version='1'/>\n"
    }
    xml ++= "  <way id='77' version='1'>\n"
    nodes.foreach { case (id, _, _) => xml ++= s"    <nd ref='$id'/>\n" }
    xml ++= "    <tag k='name' v='loop'/>\n  </way>\n</osm>\n"
    val xmlTmp = Files.createTempFile("graft-pbf-spec", ".osm")
    xmlTmp.toFile.deleteOnExit()
    Files.writeString(xmlTmp, xml.toString)

    val pbfTmp = Files.createTempFile("graft-pbf-spec", ".osm.pbf")
    pbfTmp.toFile.deleteOnExit()
    OsmPbf.writePbf(pbfTmp.toString,
      nodes.map { case (id, x, y) => OsmPbf.PbfNode(id, x, y) },
      Seq(OsmPbf.PbfWay(77L, nodes.map(_._1), tags = Seq("name" -> "loop"))))

    val sx = OsmImport.parse(spark, xmlTmp.toString)
    val sp = OsmPbf.parsePbf(spark, pbfTmp.toString)
    // identical staging → identical assembled geometry
    val gx = OsmImport.assembleWays(sx).select("way_id", "props", "geometry").collect()
    val gp = OsmImport.assembleWays(sp).select("way_id", "props", "geometry").collect()
    assert(gx.length == 1 && gp.length == 1)
    assert(gx.head.getLong(0) == gp.head.getLong(0))
    assert(gx.head.getMap[String, String](1) == gp.head.getMap[String, String](1))
    assert(java.util.Arrays.equals(
      gx.head.getAs[Array[Byte]](2), gp.head.getAs[Array[Byte]](2)),
      "assembled WKB differs between XML and PBF paths")
  }
}
