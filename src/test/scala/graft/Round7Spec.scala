package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.engine.{GeoFrame, SpatialCatalog, SpatialProcedures}
import graft.functions.{DynamicLayerJson, Ecql, st}
import graft.geom.Orthodromic
import graft.osm.OsmImport
import graft.pipeline.Graphs

/** Round-7 additions: ECQL arithmetic/LIKE/IN grammar, asin-widened +
  * antimeridian-wrapped DWITHIN windows, loud-failure dynamic-layer
  * compile + way-node-chain execution, catalog props-merge / x-y attribute
  * fidelity / write atomicity, sccLabels loud caps, DOULION triangles,
  * and the static procedure registry.
  */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  private def propsLayerDf = Seq(
      ("1", "POINT (10 20)", "BUILDING", 5.0, "alpha"),
      ("2", "POINT (30 -10)", "AUTOMOBILE", 15.0, "beta"),
      ("3", "POINT (-40 5)", "BUILDING", 25.0, "gamma"))
    .toDF("id", "wkt", "segment", "score", "name")

  // --------------------------------------------------------------- ECQL

  test("ECQL arithmetic inside comparisons (GeoTools parity)") {
    val df = Seq((1L, 3.0, 10.0), (2L, 5.0, 9.0), (3L, 7.0, 20.0))
      .toDF("id", "a", "b")
    val got = df.filter(Ecql.toColumn("a * 2 + 1 < b", df.columns.toSet))
      .select("id").as[Long].collect().toSet
    // 1: 7 < 10 T; 2: 11 < 9 F; 3: 15 < 20 T
    assert(got == Set(1L, 3L))
    val got2 = df.filter(Ecql.toColumn("b / 2 - a >= 0", df.columns.toSet))
      .select("id").as[Long].collect().toSet
    // 1: 5-3 T; 2: 4.5-5 F; 3: 10-7 T
    assert(got2 == Set(1L, 3L))
  }

  test("ECQL LIKE / NOT LIKE / IN / BETWEEN resolve through the props map") {
    val wh = Files.createTempDirectory("graft-r7-ecql").toString
    val cat = new SpatialCatalog(spark, wh)
    val layer = cat.createWktLayer("r7ecql", propsLayerDf, "id", "wkt")
    def ids(ecql: String): Set[String] =
      layer.filterEcql(ecql).df.select("id").as[String].collect().toSet
    assert(ids("segment LIKE 'BUIL%'") == Set("1", "3"))
    assert(ids("segment NOT LIKE 'BUIL%'") == Set("2"))
    assert(ids("name IN ('alpha', 'gamma')") == Set("1", "3"))
    assert(ids("score BETWEEN 10 AND 30") == Set("2", "3"))
    assert(ids("score * 2 IN (10, 50)") == Set("1", "3"))
    assert(ids("name NOT IN ('alpha', 'gamma')") == Set("2"))
    assert(ids("INCLUDE") == Set("1", "2", "3"))
    assert(ids("EXCLUDE").isEmpty)
    assert(ids("INCLUDE AND score > 10") == Set("2", "3"))
  }

  test("negative trailing WKT coordinates survive the arithmetic tokenizer") {
    // '-' after a number is a binary-minus SYMBOL now; inside a WKT literal
    // it must still read as the sign of the next coordinate
    val df = propsLayerDf
    val wh = Files.createTempDirectory("graft-r7-wkt").toString
    val layer = new SpatialCatalog(spark, wh).createWktLayer("r7wkt", df, "id", "wkt")
    val got = layer.filterEcql(
        "INTERSECTS(the_geom, POLYGON ((25 -15, 35 -15, 35 -5, 25 -5, 25 -15)))")
      .df.select("id").as[String].collect().toSet
    assert(got == Set("2"))
  }

  // ------------------------------------------- DWITHIN window correctness

  test("searchWindow uses the exact asin longitude extent and pole cap") {
    // lat 60, 1500 km: first-order c/cosφ under-covers by ~0.9°
    val w = Orthodromic.searchWindow(0.0, 60.0, 1500.0)
    val c = 1500.0 / 6371.0
    val firstOrder = math.toDegrees(c / math.cos(math.toRadians(60.0)))
    val exact = math.toDegrees(math.asin(math.sin(c) / math.cos(math.toRadians(60.0))))
    assert(w.getMaxX > firstOrder, "window must be wider than the first-order extent")
    assert(math.abs(w.getMaxX - exact) < 1e-9)
    // ball reaching the pole ⇒ full longitude span
    val wp = Orthodromic.searchWindow(0.0, 85.0, 1500.0)
    assert(wp.getMinX == -180.0 && wp.getMaxX == 180.0)
    assert(wp.getMaxY == 90.0)
  }

  test("withinDistanceKm finds in-radius rows across the antimeridian") {
    val df = Seq(("a", 179.5, 0.0), ("b", -179.8, 0.0), ("c", 170.0, 0.0),
        ("d", -170.0, 0.0))
      .toDF("id", "x", "y")
      .withColumn("geometry", st.makePoint(col("x"), col("y")))
      .withColumn("gtype", lit(graft.geom.GeomCodec.GTYPE_POINT))
      .withColumn("bbox", st.bboxStruct(col("x"), col("y"), col("x"), col("y")))
    // 200 km around (179.9, 0): covers a (~44 km) and b (~33 km across ±180)
    val got = new GeoFrame(df).withinDistanceKm(179.9, 0.0, 200.0)
      .df.select("id").as[String].collect().toSet
    assert(got == Set("a", "b"), s"expected both sides of the antimeridian, got $got")
  }

  // -------------------------------------------- dynamic layer: node chains

  test("dynamic-layer JSON: unknown step types and chain misuse fail loudly") {
    val cols = Set("id", "geometry", "gtype", "bbox", "props")
    def bad(json: String): String =
      intercept[IllegalArgumentException](DynamicLayerJson.compile(json, cols))
        .getMessage
    assert(bad("""{"step": {"type": "BBOX", "direction": "OUTGOING"}}""")
      .contains("unsupported step type"))
    assert(bad("""{"step": {"type": "NEXT", "direction": "OUTGOING"}}""")
      .contains("only valid after FIRST_NODE"))
    // a chain query cannot compile to a Column — needs the staging join
    val chain = """{"step": {"type": "GEOM", "direction": "INCOMING",
                  |  "step": {"type": "FIRST_NODE", "direction": "OUTGOING"}}}""".stripMargin
    assert(intercept[IllegalArgumentException](
      DynamicLayerJson.toColumn(chain, cols)).getMessage.contains("way-node chain"))
    // GEOM/TAGS-only queries still compile to a Column
    DynamicLayerJson.toColumn(
      """{"step": {"type": "TAGS", "direction": "OUTGOING",
        |  "properties": {"highway": "residential"}}}""".stripMargin, cols)
  }

  private def osmFixture(): (GeoFrame, OsmImport.Staging) = {
    // two ways: 100 has 3 nodes (versions 1,2,3), 200 has 2 nodes (1,1)
    val xml =
      """<?xml version='1.0'?>
        |<osm version='0.6'>
        |  <node id='1' lat='0.0' lon='0.0' version='1'/>
        |  <node id='2' lat='0.0' lon='1.0' version='2'/>
        |  <node id='3' lat='0.0' lon='2.0' version='3'/>
        |  <node id='4' lat='1.0' lon='0.0' version='1'/>
        |  <node id='5' lat='1.0' lon='1.0' version='1'/>
        |  <way id='100' version='1'>
        |    <nd ref='1'/><nd ref='2'/><nd ref='3'/>
        |    <tag k='highway' v='residential'/>
        |  </way>
        |  <way id='200' version='1'>
        |    <nd ref='4'/><nd ref='5'/>
        |    <tag k='highway' v='residential'/>
        |  </way>
        |</osm>""".stripMargin
    val f = Files.createTempFile("graft-r7-osm", ".osm")
    f.toFile.deleteOnExit()
    Files.writeString(f, xml)
    val st8 = OsmImport.parse(spark, f.toString)
    (new GeoFrame(OsmImport.assembleWays(st8)), st8)
  }

  test("way-node chain steps execute as staging semi-joins (reference walk)") {
    val (layer, st8) = osmFixture()
    def wayIds(json: String): Set[Long] =
      OsmImport.filterDynamic(layer, st8, json)
        .df.select(col("way_id").cast("long")).as[Long].collect().toSet
    val geomStep = (inner: String) =>
      s"""{"step": {"type": "GEOM", "direction": "INCOMING", $inner}}"""
    // 2nd node version=2 → only way 100
    assert(wayIds(geomStep(
      """"step": {"type": "FIRST_NODE", "direction": "OUTGOING",
        |  "step": {"type": "NEXT", "direction": "OUTGOING",
        |    "step": {"type": "NODE", "direction": "OUTGOING",
        |      "properties": {"version": 2}}}}""".stripMargin)) == Set(100L))
    // 3rd node must EXIST (getSingleRelationship null ⇒ no match) → way 100
    assert(wayIds(geomStep(
      """"step": {"type": "FIRST_NODE", "direction": "OUTGOING",
        |  "step": {"type": "NEXT", "direction": "OUTGOING",
        |    "step": {"type": "NEXT", "direction": "OUTGOING"}}}""".stripMargin)) == Set(100L))
    // properties on a proxy node: proxies carry none ⇒ dead ⇒ empty
    assert(wayIds(geomStep(
      """"step": {"type": "FIRST_NODE", "direction": "OUTGOING",
        |  "properties": {"anything": "x"}}""".stripMargin)).isEmpty)
    // NEXT INCOMING below the first proxy ⇒ walk off the chain ⇒ empty
    assert(wayIds(geomStep(
      """"step": {"type": "FIRST_NODE", "direction": "OUTGOING",
        |  "step": {"type": "NEXT", "direction": "INCOMING"}}""".stripMargin)).isEmpty)
    // node_osm_id maps onto the staging node_id column
    assert(wayIds(geomStep(
      """"step": {"type": "FIRST_NODE", "direction": "OUTGOING",
        |  "step": {"type": "NODE", "direction": "OUTGOING",
        |    "properties": {"node_osm_id": 4}}}""".stripMargin)) == Set(200L))
  }

  // ------------------------------------------------------ catalog fidelity

  test("withProps merges an existing props map instead of overwriting it") {
    val wh = Files.createTempDirectory("graft-r7-cat").toString
    val cat = new SpatialCatalog(spark, wh)
    val base = cat.createWktLayer("r7base", propsLayerDf, "id", "wkt")
    // re-layer the canonical df with one added attribute: original props
    // entries must survive, the new column must join them
    val relayered = cat.createWktLayer("r7re",
      base.df.withColumn("wkt", st.asText(col("geometry")))
        .withColumn("grade", col("id").cast("int") * 10),
      "id", "wkt")
    val row = relayered.df.filter(col("id") === "2")
      .select(col("props")("segment"), col("props")("grade")).head()
    assert(row.getString(0) == "AUTOMOBILE", "pre-existing props entry lost")
    assert(row.getString(1) == "20", "new attribute not merged into props")
  }

  test("x/y source columns on a WKT layer are attributes, not dropped") {
    val wh = Files.createTempDirectory("graft-r7-xy").toString
    val cat = new SpatialCatalog(spark, wh)
    val src = Seq(("1", "POINT (1 2)", 7.5, 8.5)).toDF("id", "wkt", "x", "y")
    val layer = cat.createWktLayer("r7xy", src, "id", "wkt")
    assert(layer.meta.get.attributes.toSet == Set("x", "y"))
    val row = layer.df.select(col("props")("x"), col("props")("y")).head()
    assert(row.getString(0) == "7.5" && row.getString(1) == "8.5")
  }

  test("concurrent appenders serialize through the layer lock (no lost update)") {
    val wh = Files.createTempDirectory("graft-r7-lock").toString
    val cat = new SpatialCatalog(spark, wh)
    cat.createWktLayer("r7lock", propsLayerDf, "id", "wkt")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    import scala.concurrent._
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    def appender(tag: Int) = Future {
      (0 until 5).foreach { i =>
        cat.appendToLayer("r7lock",
          Seq((s"$tag-$i", s"POINT ($tag $i)")).toDF("id", "wkt")
            .withColumn("geometry", st.geomFromText(col("wkt")))
            .withColumn("gtype", st.gtype(col("geometry")))
            .withColumn("bbox", st.bboxOf(col("geometry")))
            .withColumn("props", map(lit("segment"), lit("X"),
              lit("score"), lit("0"), lit("name"), lit("x")))
            .select("id", "geometry", "gtype", "bbox", "props"))
      }
    }
    val fs = Seq(appender(10), appender(20))
    Await.result(Future.sequence(fs), duration.Duration(120, "s"))
    pool.shutdown()
    val n = cat.getLayer("r7lock").df.count()
    assert(n == 3 + 10, s"expected 13 rows after 2×5 concurrent appends, got $n")
    assert(!Files.exists(java.nio.file.Paths.get(wh, "r7lock", ".layer.lock")),
      "lock file must be released")
  }

  // ----------------------------------------------------- graphs: loud caps

  test("sccLabels fails loudly when its iteration caps are exhausted") {
    // a 5-cycle needs >1 propagation round: maxProp=1 must throw, not
    // return split labels
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
      .toDF("src", "dst")
    val verts = (1L to 5L).toDF("id")
    val e = intercept[IllegalStateException](
      Graphs.sccLabels(verts, edges, maxProp = 1).collect())
    assert(e.getMessage.contains("maxProp"))
    // with sane caps the same graph is one SCC
    val ok = Graphs.sccLabels(verts, edges)
    assert(ok.select("scc").distinct().count() == 1)
  }

  test("DOULION at p=1 equals the exact triangle count; estimate scales") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L),
        (5L, 6L)).toDF("src", "dst")
    val exact = Graphs.triangleCounts(edges)
      .agg(sum("n_tri")).head().getLong(0) / 3
    val full = Graphs.triangleCountApprox(edges, p = 1.0).head()
    assert(full.getAs[Long]("tri_sampled") == exact)
    assert(full.getAs[Long]("tri_est") == exact)
    val sampled = Graphs.triangleCountApprox(edges, p = 0.5).head()
    assert(sampled.getAs[Long]("n_kept_edges") <= 7)
    assert(sampled.getAs[Long]("tri_est") >= sampled.getAs[Long]("tri_sampled"))
  }

  // --------------------------------------------------------- registry

  test("procedure registry covers the reference surface exactly once") {
    val names = SpatialProcedures.registry.map(_._1)
    assert(names.distinct.size == names.size, "duplicate registry names")
    val expected = Set("spatial.procedures", "spatial.addLayer",
      "spatial.addWKTLayer", "spatial.addPointLayerXY", "spatial.bbox",
      "spatial.closest", "spatial.withinDistance", "spatial.intersects",
      "spatial.cql", "spatial.importShapefile", "spatial.importOSM",
      "spatial.asMap", "spatial.wktToGeoJson", "spatial.decodeGeometry")
    assert(expected.subsetOf(names.toSet))
    assert(names.size == 54, s"registry size drifted: ${names.size}")
  }

  // ------------------------------------------- filtered ANN + normalization

  test("filtered ANN escalates nprobe until k candidates, never past nlist") {
    import graft.pipeline.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    // selective filter: must return k rows, all passing the filter, scored
    // identically to a brute-force cosine over the same filtered candidates
    val got = Similarity.ivfFilteredTopK(emb, "vec_id", "embedding",
      col("label") === 3, q, k = 20, nlist = 16, nprobe = 2).collect()
    assert(got.length == 20)
    val labels = emb.filter(col("label") === 3).select("vec_id")
      .as[Long].collect().toSet
    assert(got.forall(r => labels.contains(r.getLong(0))))
    // impossible filter: empty result, no crash (escalation tops out at nlist)
    val none = Similarity.ivfFilteredTopK(emb, "vec_id", "embedding",
      col("label") === -1, q, k = 20, nlist = 16, nprobe = 2).collect()
    assert(none.isEmpty)
    // non-selective filter with k tiny: stays inside the base probe width,
    // and equals unfiltered IVF top-k over the same probe width
    val all = Similarity.ivfFilteredTopK(emb, "vec_id", "embedding",
      lit(true), q, k = 5, nlist = 16, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val plain = Similarity.ivfTopK(emb, "vec_id", "embedding", q,
      k = 5, nlist = 16, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(all == plain)
  }

  test("IVF delete: tombstone probe ≡ compacted probe; emptied lists dropped") {
    import graft.pipeline.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val d = Files.createTempDirectory("graft-r7-ivfdel")
    val p = d.resolve("idx").toString
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", p, nlist = 8)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    // wipe one whole list plus a few scattered ids
    val byList = spark.read.parquet(p)
      .groupBy("list_id").agg(collect_list("id").as("ids"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val wipe = byList.keys.min
    val deleted = (byList(wipe) ++ byList.values.flatten.filter(_ % 5 == 0)).distinct.toSeq
    Similarity.deleteFromIvfIndex(spark, p, deleted)
    val tomb = Similarity.probeStoredIvf(spark, p, q, k = 10, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(tomb.nonEmpty && tomb.forall(r => !deleted.contains(r._1)))
    val rewritten = Similarity.compactIvfIndex(spark, p)
    assert(rewritten.contains(wipe))
    // the fully-emptied partition directory must be gone, not just empty
    assert(!new java.io.File(s"$p/list_id=$wipe").exists())
    assert(Similarity.ivfTombstones(spark, p).isEmpty)
    val compacted = Similarity.probeStoredIvf(spark, p, q, k = 10, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(compacted == tomb)
  }

  test("boruvkaMsf equals a sequential Kruskal on the same composite weights") {
    val edges = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .join(spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"),
        col("l_quantity").cast("long").as("w"))
    val got = Graphs.boruvkaMsf(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // reference Kruskal with union-find on the identical composite key order
    val und = edges.select(
        least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"),
        col("w"))
      .groupBy("a", "b").agg(min("w").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val want = und.sortBy { case (a, b, w) => (w, a, b) }.flatMap {
      case (a, b, w) =>
        val (ra, rb) = (find(a), find(b))
        if (ra == rb) None else { parent(ra) = rb; Some((a, b, w)) }
    }.toSet
    assert(got == want, s"MSF mismatch: ${got.size} vs ${want.size} edges")
    // spanning-forest size sanity: |V| - #components
    val nodes = und.flatMap(e => Seq(e._1, e._2)).distinct.size
    assert(got.size <= nodes - 1)
  }

  test("dropDuplicatesWithinWatermark semantics pin: no drop-extension, eviction lag") {
    // Pins the empirically-derived state machine the st_stream_dedupw
    // oracle replays: (a) duplicates never extend the stored expiry,
    // (b) eviction runs at END of batch b with W_b, so state is alive
    // during batch b iff expiry >= W_{b-1}. If a Spark upgrade changes
    // either rule, this fails loudly before the driver gate does.
    val d = Files.createTempDirectory("graft-r7-ddwpin")
    val src = d.resolve("in").toString
    val ckpt = d.resolve("ckpt").toString
    def ts(h: Double) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2026, 1, 1, 0, 0, 0).plusSeconds((h * 3600).toLong))
    val batches = Seq(
      Seq((1L, 0.0), (1L, 0.5), (2L, 0.2)),  // within-batch dup k1 dropped
      Seq((2L, 0.9), (3L, 1.0)),             // k2 dup within delay dropped
      Seq((1L, 5.0), (3L, 5.1)),             // alive via W-lag ⇒ both dropped
      Seq((4L, 20.0)),                       // watermark push
      Seq((1L, 20.5), (3L, 20.6)),           // state long evicted ⇒ re-emit
      Seq((5L, 21.0), (5L, 21.5)),           // dup does NOT extend expiry…
      Seq((6L, 23.2)),                       // …wm pushes past 22.0 expiry…
      Seq((5L, 22.3)))                       // …but W-LAG keeps k5 alive ⇒ drop
    batches.foreach { b =>
      b.map { case (k, h) => (k, ts(h)) }.toDF("k", "ets")
        .repartition(1).write.mode("append").parquet(src)
    }
    val staged = spark.read.parquet(src)
    val q = spark.readStream.schema(staged.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .withWatermark("ets", "1 hour")
      .dropDuplicatesWithinWatermark("k")
      .writeStream.format("memory").queryName("r7_ddw_pin")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    awaitAndStop(q, 120000)
    val got = spark.table("r7_ddw_pin").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val want = Set((1L, ts(0.0)), (1L, ts(20.5)), (2L, ts(0.2)),
      (3L, ts(1.0)), (3L, ts(20.6)), (4L, ts(20.0)), (5L, ts(21.0)),
      (6L, ts(23.2)))
    assert(got == want, s"semantics drifted:\n got=$got\nwant=$want")
  }

  test("normalizeText is idempotent and its output is clean NFC (property)") {
    import java.text.Normalizer
    // deterministic noisy-string generator mixing combining marks, ZWSP,
    // controls, runs of spaces, and plain text
    val atoms = Array("a", "é", "ö", "\u200B", "\t", "\r\n", "  ",
      "x y", "Ω", " ", "z\u030A", " ", "caf", "9")
    val rnd = new scala.util.Random(7)
    val rows = (0 until 240).map { _ =>
      (0 until (1 + rnd.nextInt(12))).map(_ => atoms(rnd.nextInt(atoms.length))).mkString
    }
    val df = rows.toDF("raw")
    val once = graft.pipeline.Corpus.normalizeText(col("raw"))
    val got = df.select(once.as("c1"),
        graft.pipeline.Corpus.normalizeText(once).as("c2"))
      .collect()
    got.foreach { r =>
      val c1 = r.getString(0); val c2 = r.getString(1)
      assert(c1 == c2, s"not idempotent: ${c1} vs ${c2}")
      assert(!c1.exists(ch => ch < ' ' || ch == '\u200B'), s"dirty: $c1")
      assert(!c1.contains("  ") && c1 == c1.trim, s"spacing: '$c1'")
      assert(Normalizer.isNormalized(c1, Normalizer.Form.NFC), s"not NFC: $c1")
    }
  }

  test("srpRangeSearch returns a τ-true subset of the brute-force range set") {
    import graft.pipeline.Similarity
    assert(Similarity.probeMasks(8, 2).size == 1 + 8 + 28)
    assert(Similarity.probeMasks(8, 2).distinct.size == 37)
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val qs = emb.filter(col("vec_id") % 100 === 0)
    val got = Similarity.srpRangeSearch(emb, qs, "vec_id", "embedding",
        tau = 0.3, dim = 64, bits = 8, probeHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    assert(got.forall(_._3 >= 0.3))
    // subset of the exact range join (prefilter may miss, never invent)
    val brute = qs.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .crossJoin(emb.select(col("vec_id").as("id"), col("embedding").as("v")))
      .filter(col("qid") =!= col("id"))
      .filter(Similarity.cosine(
        transform(col("qv"), _.cast("double")),
        transform(col("v"), _.cast("double"))) >= 0.3)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.forall(p => brute.contains((p._1, p._2))))
  }

  test("vadSegments merges exactly the maximal runs of active windows") {
    import graft.pipeline.Multimodal
    val media = Multimodal.syntheticMedia(spark, 120)
    val act = Multimodal.sampleWaveform(media, 8, 32)
      .filter(col("sample_sum") / 32 > 0.5)
      .select(col("media_id"), col("window_idx"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList).toMap
    // brute-force maximal runs from the active-window sets
    val want = act.toSeq.flatMap { case (id, ws) =>
      ws.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, w) if w == e + 1 => (s, w) :: rest
        case (acc, w) => (w, w) :: acc
      }.reverse.zipWithIndex.map { case ((s, e), i) => (id, i + 1L, s.toLong, e.toLong) }
    }.toSet
    val got = Multimodal.vadSegments(media, 8, 32, 0.5)
      .select("media_id", "seg_idx", "seg_start", "seg_end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    // every segment is a contiguous run
    Multimodal.vadSegments(media, 8, 32, 0.5).collect().foreach { r =>
      assert(r.getAs[Long]("n_windows") ==
        r.getAs[Long]("seg_end") - r.getAs[Long]("seg_start") + 1)
    }
  }

  test("tx_ppl_bucket plans with no global-window exec (globalRank deciles)") {
    val df = SparkEntry.queries("tx_ppl_bucket")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global WindowExec crept back:\n$plan")
    // bucket assignment must stay ntile-identical
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.keySet == (1L to 10L).toSet)
  }

  test("normalizeText NFC-composes, strips controls/ZWSP, collapses spaces") {
    val df = Seq(
      ("e\u0301clair", "\u00e9clair"),                  // combining acute composes
      ("a\u200Bb", "ab"),                           // zero-width space stripped
      ("  x \t\r\n y  ", "x y"),                    // controls + runs + trim
      ("o\u0308 O\u0308", "\u00f6 \u00d6")                    // diaeresis composes
    ).toDF("raw", "want")
    val got = df.select(
      graft.pipeline.Corpus.normalizeText(col("raw")).as("got"), col("want"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"${r.getString(0)} != ${r.getString(1)}"))
  }

  test("trussPeel: 5-clique survives 5-truss, bridges and pendant triangles peel") {
    // K5 on 1..5 (every edge on 3 triangles) + a pendant triangle {5,6,7}
    // (each edge on exactly 1 triangle) + a bridge 7-8 (no triangle).
    val k5 = for (i <- 1 to 5; j <- (i + 1) to 5) yield (i.toLong, j.toLong)
    val extra = Seq((5L, 6L), (5L, 7L), (6L, 7L), (7L, 8L))
    val edges = (k5 ++ extra).toDF("src", "dst")
    // 5-truss (support >= 3): exactly the K5 edges, each with support 3
    val t5 = Graphs.trussPeel(edges, k = 5, rounds = 3).collect()
    assert(t5.length == 10)
    assert(t5.forall(_.getLong(2) == 3L))
    assert(t5.map(r => (r.getLong(0), r.getLong(1))).toSet == k5.toSet)
    // 3-truss (support >= 1): K5 plus the pendant triangle; bridge gone
    val t3 = Graphs.trussPeel(edges, k = 3, rounds = 2).collect()
    assert(t3.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      (k5 ++ Seq((5L, 6L), (5L, 7L), (6L, 7L))).toSet)
    assert(t3.filter(r => r.getLong(0) >= 5).forall(_.getLong(2) == 1L))
  }

  test("pcaLabelStats recovers a known dominant axis, exact lambda") {
    // four 4-d vectors: +/-2 on axis 0, +/-0.1 on axis 1 => PC1 = e0,
    // lambda = 4.0 exactly (quantization of +/-2 is exact; the e1 residual
    // decays as (0.0099/4)^12). Labels split by sign of the projection.
    import graft.pipeline.Similarity
    val rows = Seq(
      (0, Array(-2f, 0.1f, 0f, 0f)), (0, Array(-2f, -0.1f, 0f, 0f)),
      (1, Array(2f, 0.1f, 0f, 0f)), (1, Array(2f, -0.1f, 0f, 0f)))
      .toDF("label", "embedding")
    val out = Similarity.pcaLabelStats(rows, "embedding", "label", dim = 4)
      .collect()
    assert(out.length == 2)
    assert(out.forall(_.getDouble(5) == 4.0), s"lambda ${out.head.getDouble(5)}")
    val byLabel = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byLabel(0L) == -2.0 && byLabel(1L) == 2.0)
  }

  test("ECQL temporal predicates: BEFORE/AFTER/DURING and period forms") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, t("2006-11-30 00:00:00")), (2L, t("2006-11-30 00:30:00")),
      (3L, t("2006-11-30 01:00:00")), (4L, t("2006-11-30 01:30:00")),
      (5L, t("2006-12-25 12:00:00"))).toDF("id", "ts")
    def ids(q: String) = df.filter(Ecql.toColumn(q, df.columns.toSet))
      .select("id").as[Long].collect().toSet
    assert(ids("ts BEFORE 2006-11-30T01:00:00Z") == Set(1L, 2L))
    assert(ids("ts AFTER 2006-11-30T01:00:00Z") == Set(4L, 5L))
    // DURING is strictly inside (GeoTools FES compilation)
    assert(ids("ts DURING 2006-11-30T00:00:00Z/2006-11-30T01:30:00Z") ==
      Set(2L, 3L))
    assert(ids("ts BEFORE OR DURING 2006-11-30T00:00:00Z/2006-11-30T01:00:00Z")
      == Set(1L, 2L, 3L))
    assert(ids("ts DURING OR AFTER 2006-11-30T01:00:00Z/2006-11-30T01:30:00Z")
      == Set(3L, 4L, 5L))
    // BEFORE a period = before its start; AFTER a period = after its end
    assert(ids("ts BEFORE 2006-11-30T00:30:00Z/2006-11-30T01:00:00Z") == Set(1L))
    assert(ids("ts AFTER 2006-11-30T00:30:00Z/2006-11-30T01:00:00Z") ==
      Set(4L, 5L))
    // date-only literal = midnight UTC; also usable in plain comparisons
    assert(ids("ts AFTER 2006-12-01") == Set(5L))
    assert(ids("ts >= 2006-11-30T01:30:00Z") == Set(4L, 5L))
    // offset honored
    assert(ids("ts AFTER 2006-11-30T04:00:00+03:00") == Set(4L, 5L))
    // ISO durations are rejected loudly, not mis-parsed
    assertThrows[IllegalArgumentException](
      Ecql.toColumn("ts DURING 2006-11-30T00:00:00Z/P30D", Set("ts")))
  }
}
