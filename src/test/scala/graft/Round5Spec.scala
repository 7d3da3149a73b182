package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.engine.{GeoFrame, SpatialProcedures}
import graft.functions.{Ecql, st}
import graft.geom.GeomCodec

/** Round-5 surface: the ECQL front-end (reference strings verbatim,
  * SearchCQL.java:27-60, DynamicLayer.java:106-137) and the spatial.cql
  * ECQL-or-SQL dispatch.
  */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  private def mixedLayer = {
    val rows = Seq(
      ("p1", "POINT (1 1)", "residential", "50"),
      ("p2", "POINT (5 5)", "path", "30"),
      ("p3", "POINT (40 40)", "residential", "90"),
      ("l1", "LINESTRING (0 0, 10 10)", "track", null),
      ("g1", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", null, "70"))
      .toDF("id", "wkt", "highway", "speed")
    val df = rows
      .withColumn("geometry", st.geomFromText(col("wkt")))
      .withColumn("bbox", st.bboxOf(col("geometry")))
      .withColumn("props", map(
        lit("highway"), col("highway"), lit("speed"), col("speed")))
      .drop("highway", "speed")
    new GeoFrame(df)
  }

  private def ids(g: GeoFrame): Set[String] =
    g.df.select("id").as[String].collect().toSet

  test("reference-shape ECQL strings run verbatim") {
    val layer = mixedLayer
    // DynamicLayer.addCQLDynamicLayerOnAttribute shape (value + gtype)
    assert(ids(layer.filterEcql(
      "highway = 'residential' AND geometryType(the_geom) = 'Point'")) == Set("p1", "p3"))
    // the null-value variant: key IS NOT NULL AND geometryType(...)
    assert(ids(layer.filterEcql(
      "highway IS NOT NULL AND geometryType(the_geom) = 'LineString'")) == Set("l1"))
    // SpatialProceduresTest.testCQLQuery shape
    assert(ids(layer.filterEcql("id = 'p2'")) == Set("p2"))
    // geometry-type-only dynamic layer
    assert(ids(layer.filterEcql("geometryType(the_geom) = 'Polygon'")) == Set("g1"))
  }

  test("ECQL comparisons, BETWEEN, IN, LIKE, NOT, parentheses, props numeric coercion") {
    val layer = mixedLayer
    // props values are strings; numeric literal comparison casts
    assert(ids(layer.filterEcql("speed > 40")) == Set("p1", "p3", "g1"))
    assert(ids(layer.filterEcql("speed BETWEEN 30 AND 70")) == Set("p1", "p2", "g1"))
    assert(ids(layer.filterEcql("highway IN ('path', 'track')")) == Set("p2", "l1"))
    assert(ids(layer.filterEcql("id LIKE 'p%'")) == Set("p1", "p2", "p3"))
    assert(ids(layer.filterEcql("NOT (speed > 40 OR highway = 'path')")) == Set())
    assert(ids(layer.filterEcql("speed <= 50 AND highway <> 'path'")) == Set("p1"))
    assert(ids(layer.filterEcql("highway IS NULL")) == Set("g1"))
  }

  test("ECQL spatial predicates match the API searches and keep the bbox prune") {
    val layer = mixedLayer
    assert(ids(layer.filterEcql("BBOX(the_geom, 0, 0, 6, 6)")) ==
      Set("p1", "p2", "l1", "g1"))
    val poly = "POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0))"
    assert(ids(layer.filterEcql(s"INTERSECTS(the_geom, $poly)")) ==
      ids(layer.intersects(poly)))
    assert(ids(layer.filterEcql(s"WITHIN(the_geom, $poly)")) ==
      ids(layer.within(GeomCodec.fromWkt(poly))))
    assert(ids(layer.filterEcql("DISJOINT(the_geom, POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0)))")) ==
      Set("p3"))
    // degrees (or any unrecognized token) keep the planar layer-CRS
    // semantics the reference's GeoTools-on-geographic-CRS path had
    assert(ids(layer.filterEcql("DWITHIN(the_geom, POINT (0 0), 2, degrees)")) ==
      Set("p1", "l1", "g1"))
    // round 6: metric units MEAN meters — only geometries touching the
    // origin are within 2 m (p1 at (1,1) is ~157 km out)
    assert(ids(layer.filterEcql("DWITHIN(the_geom, POINT (0 0), 2, meters)")) ==
      Set("l1", "g1"))
    // and 200 geodesic kilometers pulls p1 back in
    assert(ids(layer.filterEcql("DWITHIN(the_geom, POINT (0 0), 200, kilometers)")) ==
      Set("p1", "l1", "g1"))
    // negative WKT coordinates survive the literal re-assembly
    assert(ids(layer.filterEcql("INTERSECTS(the_geom, POLYGON ((-2 -2, 2 -2, 2 2, -2 2, -2 -2)))")) ==
      Set("p1", "l1", "g1"))
  }

  test("spatial.cql dispatches ECQL first, Spark SQL as fallback") {
    val wh = Files.createTempDirectory("graft-ecql-wh").toString
    val procs = new SpatialProcedures(spark, wh)
    val pts = Seq(("a", 1.0, 1.0), ("b", 5.0, 5.0), ("c", 9.0, 9.0))
      .toDF("name", "lon", "lat")
    procs.addPointLayerXY("cqlpts", pts, "name", "lon", "lat")
    // ECQL (would also parse as Spark SQL — must give identical results;
    // the attribute column became the layer id, the reference's node name)
    assert(procs.cql("cqlpts", "id = 'b'").count() == 1)
    // ECQL-only shape (geometryType is not a Spark function)
    assert(procs.cql("cqlpts", "geometryType(the_geom) = 'Point'").count() == 3)
    // Spark-SQL-only shape (ECQL parse fails → fallback); only c (9+9)
    assert(procs.cql("cqlpts", "x + y > 10").count() == 1)
  }

  test("malformed ECQL does not parse (fallback signal), good ECQL does") {
    assert(!Ecql.parses("SELECT * FROM x", Set("id")))
    assert(!Ecql.parses("name = ", Set("name")))
    assert(Ecql.parses("name = 'x' AND (a < 3 OR b IS NULL)", Set("name", "a", "b")))
  }

  test("quantizer tree degenerates to the flat IVF join when branch >= nlist") {
    import graft.pipeline.Similarity
    // branch >= nlist leaves no parent levels: assignment and probing scan
    // all centroids — exactly the flat variant's quantizer, so outputs
    // must be identical row-for-row (a non-circular equivalence; the
    // two-level variant is the tree by construction)
    def vec(seed: Int): Array[Float] =
      Array.tabulate(6)(d => (((seed * 31 + d * 17) % 13) - 6).toFloat / 6f)
    val df = (0L until 40L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") % 7 === 0)
    val flat = Similarity.ivfKnnJoin(df, q, "vec_id", "embedding",
      k = 4, nlist = 8, nprobe = 3).orderBy("qid", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val tree = Similarity.ivfKnnJoinTree(df, q, "vec_id", "embedding",
      k = 4, nlist = 8, nprobe = 3, branch = 8, beam = 2).orderBy("qid", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(flat == tree)
    assert(flat.nonEmpty)
  }

  test("depth-3 quantizer tree: exact duplicate at rank 1, dense ranks, no self") {
    import graft.pipeline.Similarity
    def vec(axis: Int, jitter: Float): Array[Float] = {
      val v = new Array[Float](4); v(axis) = 1.0f; v((axis + 1) % 4) = jitter; v
    }
    val rows = (0 until 30).map { i =>
      val axis = i % 3
      (i.toLong, vec(axis, 0.01f * (i / 3)))
    } :+ (100L, vec(0, 0.03f)) // exact duplicate of id 9's vector
    val df = rows.toDF("vec_id", "embedding")
    // nlist=16, branch=3 → parent sizes 6, 2: a genuine 3-level descent
    val out = Similarity.ivfKnnJoinTree(df,
        df.filter(col("vec_id") === 9 || col("vec_id") === 10),
        "vec_id", "embedding", k = 3, nlist = 16, nprobe = 2,
        branch = 3, beam = 2)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == Set(9L, 10L))
    for ((q, ns) <- byQ) {
      val sorted = ns.sortBy(_._2)
      assert(sorted.map(_._2) == (1L to sorted.size.toLong))
      assert(!sorted.exists(_._3 == q))
    }
    assert(byQ(9L).find(_._2 == 1L).get._3 == 100L)
    assert(byQ(9L).find(_._2 == 1L).get._4 == 1.0)
  }

  test("stored IVF index: append touches only landed partitions, probe is partition-pruned") {
    import graft.pipeline.Similarity
    def vec(seed: Int): Array[Float] =
      Array.tabulate(6)(d => (((seed * 31 + d * 17) % 13) - 6).toFloat / 6f)
    val boot = (0L until 60L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft-ivf-store-test")
    dir.toFile.deleteOnExit()
    val p = dir.resolve("idx").toString
    Similarity.writeIvfIndex(boot, "vec_id", "embedding", p, nlist = 8)

    def snapshot(): Map[String, Seq[(String, Long)]] = {
      val root = new java.io.File(p)
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("list_id="))
        .map(d => d.getName ->
          d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.length())).toSeq.sortBy(_._1).toSeq)
        .toMap
    }
    val before = snapshot()
    assert(before.nonEmpty)

    val batch = (100L until 110L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    Similarity.appendIvfIndex(spark, p, batch, "vec_id", "embedding")
    val after = snapshot()

    // the batch's landed lists: frozen-centroid assignment replayed here
    val cents = Similarity.readIvfCentroids(spark, p)
    val landed = (100 until 110).map { i =>
      val v = vec(i).map(_.toDouble).toSeq
      cents.maxBy { case (ci, cv) =>
        (graft.pipeline.Similarity.centCos(cv, v), -ci) }._1
    }.toSet.map((l: Int) => s"list_id=$l")
    // untouched partition dirs are file-for-file identical
    for ((d, files) <- before if !landed.contains(d))
      assert(after(d) == files, s"untouched partition $d changed")
    // landed partitions gained files, none lost
    for (d <- landed if before.contains(d))
      assert(after(d).size > before(d).size && before(d).toSet.subsetOf(after(d).toSet))

    // the probe carries list_id as a PARTITION filter (directory pruning)
    val probe = Similarity.probeStoredIvf(spark, p, vec(3).map(_.toDouble).toArray,
      k = 5, nprobe = 2)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*list_id".r.findFirstIn(plan).isDefined, plan)
    // and the probed result equals the unpruned rerank over the probed lists
    assert(probe.count() == 5)
  }

  test("quantizer tree recall-vs-exact on a clustered corpus") {
    import graft.pipeline.Similarity
    // 4 tight clusters: within-cluster neighbors dominate the exact top-k,
    // and cluster members quantize together, so the tree's recall@3 must
    // be high (the recall gate the docstring promises, run as a unit gate)
    def vec(axis: Int, jitter: Float): Array[Float] = {
      val v = new Array[Float](8); v(axis * 2) = 1.0f; v(axis * 2 + 1) = jitter; v
    }
    val df = (0L until 48L).map(i => (i, vec((i % 4).toInt, 0.02f * (i / 4))))
      .toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") < 8)
    // each cluster spans 3 of the 12 leaf lists, so the probe budget must
    // cover 3 lists for the within-cluster exact top-k to be reachable
    // (nprobe=2 caps recall at ~2/3 by construction — the budget-vs-recall
    // trade recallAtK exists to expose)
    val tree = Similarity.ivfKnnJoinTree(df, q, "vec_id", "embedding",
      k = 3, nlist = 12, nprobe = 3, branch = 3, beam = 2)
    val r = Similarity.recallAtK(tree, df, q, "vec_id", "embedding", k = 3)
      .as[(Long, Double, Double)].head()
    assert(r._1 == 8L)
    assert(r._2 >= 0.9, s"avg recall@3 ${r._2}")
  }

  test("Web-Mercator: column path == JVM path, inverse closes, known pins") {
    import graft.geom.Mercator
    // EPSG:3857 pin: lon 2.2945, lat 48.8584 (Eiffel Tower), values
    // cross-computed with an independent libm (CPython):
    // x = 255 422.5716 m, y = 6 250 868.9015 m
    assert(math.abs(Mercator.xM(2.2945) - 255422.57162516622) < 1e-6)
    assert(math.abs(Mercator.yM(48.8584) - 6250868.901479604) < 1e-5)
    // equator maps to y = 0 up to tan(fl(π/4)) ulp noise (~1e-9 m); x spans
    // ±πR at the antimeridian
    assert(math.abs(Mercator.yM(0.0)) < 1e-8)
    assert(math.abs(Mercator.xM(180.0) - math.Pi * Mercator.RadiusM) < 1e-6)
    // forward∘inverse is identity to double precision
    for (lat <- Seq(-85.05, -45.0, -0.5, 33.3, 71.2); lon <- Seq(-179.5, -12.0, 99.9)) {
      assert(math.abs(Mercator.latDeg(Mercator.yM(lat)) - lat) < 1e-9)
      assert(math.abs(Mercator.lonDeg(Mercator.xM(lon)) - lon) < 1e-12)
    }
    // the codegen'd Column forward matches the JVM forward bit-for-bit
    // (both compile to java.lang.Math), and the geometry-level transform
    // moves every coordinate identically
    val pts = Seq((1L, -170.5, -80.5), (2L, 0.5, 0.5), (3L, 150.5, 60.5))
      .toDF("id", "x", "y")
    val cols = pts.select(col("id"), st.mercatorX(col("x")).as("mx"),
        st.mercatorY(col("y")).as("my"),
      st.toMercator(st.makePoint(col("x"), col("y"))).as("g"))
      .withColumn("gx", st.x(col("g"))).withColumn("gy", st.y(col("g")))
      .select("id", "mx", "my", "gx", "gy")
      .as[(Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    cols.zip(Seq((1L, -170.5, -80.5), (2L, 0.5, 0.5), (3L, 150.5, 60.5))).foreach {
      case ((id, mx, my, gx, gy), (eid, x, y)) =>
        assert(id == eid)
        assert(mx == graft.geom.Mercator.xM(x) && my == Mercator.yM(y))
        assert(gx == mx && gy == my, s"geometry transform diverges at id $id")
    }
    // the HOT-tier claim, held to its plan: forward AND inverse are pure
    // codegen arithmetic — no ScalaUDF anywhere in the projection
    val plan = pts.select(st.mercatorX(col("x")),
        st.mercatorLat(st.mercatorY(col("y"))))
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("UDF"), s"mercator fell out of codegen:\n$plan")
  }

  test("bfs: min-hop frontier expansion, bounded depth, unreachable absent") {
    import graft.pipeline.Graphs
    // path 1→2→3→4→5 with a shortcut 1→4; 9 is disconnected; 6→1 points
    // INTO the seed so 6 must stay unreached on the directed graph
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L), (6L, 1L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got = Graphs.bfs(edges, seeds, maxHop = 4)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2))
    // depth bound truncates: at maxHop=1 only the first frontier lands
    val shallow = Graphs.bfs(edges, seeds, maxHop = 1)
      .as[(Long, Int)].collect().toMap
    assert(shallow == Map(1L -> 0, 2L -> 1, 4L -> 1))
    // multi-source: nearest seed wins
    val multi = Graphs.bfs(edges, Seq(1L, 5L).toDF("node"), maxHop = 4)
      .as[(Long, Int)].collect().toMap
    assert(multi(5L) == 0 && multi(4L) == 1 && multi(2L) == 1)
  }

  test("boxResize: block means, integral factors enforced") {
    import graft.pipeline.Multimodal
    // 4×2 grid, 2×2 blocks → 2×1: means of the two halves
    val px = Seq((1L, Seq(0f, 1f, 2f, 3f, 4f, 5f, 6f, 7f)))
      .toDF("media_id", "pixels")
    val out = Multimodal.boxResize(px, srcW = 4, srcH = 2, dstW = 2, dstH = 1)
      .select("pixels").as[Seq[Float]].head()
    // block 0 = {0,1,4,5} → 2.5; block 1 = {2,3,6,7} → 4.5
    assert(out == Seq(2.5f, 4.5f))
    intercept[IllegalArgumentException](
      Multimodal.boxResize(px, srcW = 4, srcH = 2, dstW = 3, dstH = 1))
    // identity factors are a no-op
    val same = Multimodal.boxResize(px, 4, 2, 4, 2)
      .select("pixels").as[Seq[Float]].head()
    assert(same == (0 to 7).map(_.toFloat))
  }

  test("mrl with full-dim prefix equals brute force") {
    import graft.pipeline.Similarity
    val rnd = new scala.util.Random(7)
    val df = (0L until 100L).map(i => (i, Array.fill(16)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 0)
      .select("embedding").as[Array[Float]].head().map(_.toDouble)
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 10)
      .select(col("id"), round(col("cosine"), 6).as("cosine"))
      .as[(Long, Double)].collect().toSeq
    // prefixDim = full dim ⇒ the shortlist pass IS the exact ranking
    val mrl = Similarity.mrlTopK(df, "vec_id", "embedding", q,
        prefixDim = 16, shortlist = 100, k = 10)
      .select(col("id"), col("cosine")).as[(Long, Double)].collect().toSeq
    assert(mrl == brute)
    // a true prefix still recovers the exact top-1 on this corpus after
    // the full-dim re-rank of a generous shortlist
    val mrl8 = Similarity.mrlTopK(df, "vec_id", "embedding", q,
        prefixDim = 8, shortlist = 50, k = 1)
      .select("id").as[Long].head()
    assert(mrl8 == brute.head._1)
  }

  test("sssp: cheapest path beats fewest hops, bounded rounds truncate") {
    import graft.pipeline.Graphs
    // 1→2→3 costs 1+1=2; the direct 1→3 shortcut costs 5 — min weight must
    // pick the 2-hop path even though the shortcut lands first
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 5L), (3L, 4L, 2L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("node")
    val got = Graphs.sssp(edges, seeds, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 4L))
    // with only 1 relaxation round the shortcut estimate is all there is
    val one = Graphs.sssp(edges, seeds, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(one(3L) == 5L && !one.contains(4L))
  }

  test("hexbin: every point lies within its cell's circumradius; partition is total") {
    import graft.functions.HexBin
    val size = 5.0
    // a jittered grid crossing hex boundaries in both axes, incl. negatives
    val pts = (-40 to 40 by 3).flatMap(i => (-40 to 40 by 3).map(j =>
      (i + 0.37, j - 0.61))).toDF("x", "y")
    val withCell = pts.select(col("x"), col("y"),
      HexBin.cell(col("x"), col("y"), size).as("h"))
    // pointy-top axial → cartesian center: cx = s·√3·(q + r/2), cy = s·3/2·r
    val centered = withCell.select(col("x"), col("y"),
      (lit(size * math.sqrt(3.0)) * (col("h.q") + col("h.r") / 2.0)).as("cx"),
      (lit(size * 1.5) * col("h.r")).as("cy"))
    val rows = centered.select(
        sqrt(pow(col("x") - col("cx"), 2.0) + pow(col("y") - col("cy"), 2.0)).as("d"))
      .as[Double].collect()
    assert(rows.nonEmpty)
    // circumradius bound (+ε for the cube-round tie edges)
    assert(rows.forall(_ <= size + 1e-9), s"max center distance ${rows.max}")
    // determinism/totality: re-binning the same points yields identical cells
    val a = withCell.select("h.q", "h.r").as[(Long, Long)].collect().toSeq
    val b = withCell.select("h.q", "h.r").as[(Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("hexbin aggregate: one exchange, binning inside whole-stage codegen") {
    import graft.functions.HexBin
    val pts = spark.range(1000).select(
      (col("id") % 100).cast("double").as("x"),
      (col("id") % 37).cast("double").as("y"))
    val agg = pts.select(HexBin.cell(col("x"), col("y"), 5.0).as("h"))
      .groupBy(col("h.q").as("q"), col("h.r").as("r"))
      .agg(count(lit(1)).as("n"))
    agg.collect() // materialize so AQE finalizes and codegen spans render
    // the AQE plan string repeats the tree under "== Initial Plan ==" —
    // assert on the final section only
    val plan = agg.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head
    assert(plan.split("ShuffleQueryStage").length - 1 == 1,
      s"hexbin should shuffle exactly once:\n$plan")
    assert(plan.contains("*("), s"binning fell out of codegen:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      "hexbin must be pure column arithmetic")
  }

  test("versioned layer: manifest commit, time travel, crash-window fallback, vacuum") {
    import graft.plans.VersionedLayer
    val p = Files.createTempDirectory("graft-vl-spec").resolve("l").toString
    val v1 = VersionedLayer.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), p)
    val v2 = VersionedLayer.commit(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"), p)
    assert(v1 == 1 && v2 == 2)
    assert(VersionedLayer.read(spark, p).count() == 3)          // current
    assert(VersionedLayer.read(spark, p, Some(1)).count() == 2) // time travel
    // crash window: no manifest → fallback to highest _SUCCESS version
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p, "_MANIFEST"), false)
    assert(VersionedLayer.currentVersion(spark, p).contains(2))
    assert(VersionedLayer.read(spark, p).count() == 3)
    // a partial (no _SUCCESS) version dir must be invisible
    fs.mkdirs(new org.apache.hadoop.fs.Path(p, "v=3"))
    assert(VersionedLayer.versions(spark, p) == Seq(1, 2))
    assert(VersionedLayer.currentVersion(spark, p).contains(2))
    // vacuum keeps the newest `keep` versions
    val dropped = VersionedLayer.vacuum(spark, p, keep = 1)
    assert(dropped == Seq(1) && VersionedLayer.versions(spark, p) == Seq(2))
    assert(VersionedLayer.read(spark, p).count() == 3)
  }

  test("projectPoint inverts orthodromic distance + bearing") {
    val pts = Seq((0.0, 0.0, 45.0, 500.0), (10.5, 60.0, 300.0, 1500.0),
      (-170.0, -30.0, 90.0, 2000.0), (179.5, 10.0, 10.0, 800.0))
      .toDF("lon", "lat", "b", "d")
    val rows = pts
      .withColumn("p", st.projectPoint(col("lon"), col("lat"), col("b"), col("d")))
      .select(col("d"), col("b"),
        st.orthodromicKm(col("lon"), col("lat"), col("p.lon"), col("p.lat")).as("d2"),
        st.bearingDeg(col("lon"), col("lat"), col("p.lon"), col("p.lat")).as("b2"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(0)) < 0.5,
        s"distance round-trip: ${r.getDouble(2)} vs ${r.getDouble(0)}")
      assert(math.abs(r.getDouble(3) - r.getDouble(1)) < 0.01,
        s"bearing round-trip: ${r.getDouble(3)} vs ${r.getDouble(1)}")
    }
  }

  test("incremental minhash index: second batch pairs against the first") {
    import graft.pipeline.Dedup
    val d = Files.createTempDirectory("graft-mh-spec")
    val p = d.resolve("mh").toString
    val mk = (id: Long, t: String) => (id, t)
    val base = Seq(
      mk(1, "alpha beta gamma delta epsilon zeta eta theta"),
      mk(2, "one two three four five six seven eight nine")).toDF("doc_id", "text")
    Dedup.writeMinhashIndex(base, "doc_id", "text", p)
    // batch 1: a near-dup of doc 1 → exactly the (1, 10) pair
    val b1 = Seq(mk(10, "alpha beta gamma delta epsilon zeta eta theta x"))
      .toDF("doc_id", "text")
    val p1 = Dedup.appendMinhashIndex(spark, p, b1, "doc_id", "text", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(p1 == Set((1L, 10L)), s"got $p1")
    // batch 2: a near-dup of doc 10 — provable ONLY if the append grew the
    // store (doc 10 is not in the bootstrap corpus)
    val b2 = Seq(mk(20, "alpha beta gamma delta epsilon zeta eta theta x y"))
      .toDF("doc_id", "text")
    val p2 = Dedup.appendMinhashIndex(spark, p, b2, "doc_id", "text", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(p2.contains((10L, 20L)), s"append did not grow the store: $p2")
    // history is never re-paired: (1, 10) must not re-emit
    assert(!p2.contains((1L, 10L)))
  }

  test("hits: exact integer rounds on a hand-checked graph") {
    import graft.pipeline.Graphs
    // 1→3, 2→3, 2→4: after 2 unnormalized rounds
    // a2 = {3: 5, 4: 3}, h2 = {1: 5, 2: 8}
    val e = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val got = Graphs.hits(e, iters = 2, k = 10)
      .select("side", "node", "score_raw")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("auth", 3L, 5L), ("auth", 4L, 3L),
      ("hub", 1L, 5L), ("hub", 2L, 8L)), s"got $got")
  }

  test("changepoints: a step change flags against the trailing mean") {
    import graft.pipeline.Events
    // hours 0..6 have 10 events each; hour 7 spikes to 30 (ratio 3.0)
    val rows = (0 to 6).flatMap(hr => (0 until 10).map(i =>
      (hr * 3600_000_000_000L + i, "a"))) ++
      (0 until 30).map(i => (7 * 3600_000_000_000L + i, "a"))
    val ev = rows.toDF("ts", "event_type")
    val got = Events.changepoints(ev, window = 6, up = 1.5, down = 0.5)
      .select("hour_idx", "n", "ratio").as[(Long, Long, Double)].collect()
    assert(got.toSeq == Seq((7L, 30L, 3.0)), s"got ${got.toSeq}")
  }

  test("kcore: peeling cascades and respects the round budget") {
    import graft.pipeline.Graphs
    // path a-b-c-d plus triangle d-e-f-d (undirected, symmetric list):
    // 2-core = the triangle; path nodes peel over successive rounds
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val r1 = Graphs.kcorePeel(edges, k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    // one round only drops degree-1 node 1; node 2 (now degree 1) survives
    assert(!r1.contains(1L) && r1.contains(2L))
    val r3 = Graphs.kcorePeel(edges, k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(r3.keySet == Set(4L, 5L, 6L) && r3.values.forall(_ == 2L))
  }

  test("plan contracts: attribution one user exchange, containment no cartesian, strPack no global sort-rank") {
    import graft.pipeline.{Dedup, Events}
    import graft.plans.SpatialLayout
    val ev = spark.range(2000).select((col("id") % 50).as("user_id"),
      col("id").as("event_id"), (col("id") * 977 % 100000).as("tsn"),
      element_at(array(lit("click"), lit("purchase")),
        (col("id") % 2 + 1).cast("int")).as("event_type"),
      (col("id") % 100).cast("double").as("value"))
    val aPlan = Events.lastTouchAttribution(ev)
      .queryExecution.executedPlan.toString()
    // the event volume crosses the wire once: a single user_id exchange
    assert("hashpartitioning\\(user_id".r.findAllIn(aPlan).size == 1, aPlan)
    val docs = (1 to 60).map(i =>
      (i.toLong, (i to i + 12).map(j => s"w$j").mkString(" "))).toDF("doc_id", "text")
    val cPlan = Dedup.containmentPairs(docs, "doc_id", "text", 0.9, 4)
      .queryExecution.executedPlan.toString()
    assert(!cPlan.contains("CartesianProduct")
      && !cPlan.contains("BroadcastNestedLoop"), cPlan)
    val pts = (0 until 500).map(i =>
      (i.toString, (i % 37).toDouble, (i % 53).toDouble)).toDF("id", "x", "y")
    val sPlan = SpatialLayout.strPack(pts, 16)
      .queryExecution.executedPlan.toString()
    // the global x-rank never plans as an Exchange SinglePartition + Window
    assert(!sPlan.contains("SinglePartition"), sPlan)
    // bqTopK: both the Hamming shortlist and the final cut plan as
    // TakeOrderedAndProject (per-partition heaps), never a global Sort
    val emb = spark.range(300).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        i => ((col("id") + i) % 17 - 8).cast("float")).as("embedding"))
    val bPlan = graft.pipeline.Similarity.bqTopK(emb, "vec_id", "embedding",
        Array.fill(64)(0.5), k = 5, dim = 64, shortlist = 20)
      .queryExecution.executedPlan.toString()
    assert("TakeOrderedAndProject".r.findAllIn(bPlan).size == 2, bPlan)
  }

  test("containmentPairs: finds doc-inside-doc that symmetric Jaccard misses") {
    import graft.pipeline.Dedup
    val small = (1 to 10).map(i => s"w$i").mkString(" ")          // 7 4-shingles
    val big = small + " " + (11 to 40).map(i => s"w$i").mkString(" ") // 37 shingles
    val docs = Seq((1L, small), (2L, big), (3L, "totally different text with other words entirely")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", 0.9, 4)
      .select("id_a", "id_b", "containment")
      .as[(Long, Long, Double)].collect().toSet
    // 1 ⊂ 2: containment(1→2) = 1.0; the reverse direction is 7/37 < 0.9;
    // the symmetric Jaccard of the pair is 7/37 ≈ 0.19 — invisible at 0.9
    assert(got == Set((1L, 2L, 1.0)), s"got $got")
  }

  test("lastTouchAttribution: lookback honored, unattributed bucket kept") {
    import graft.pipeline.Events
    val day = 86400000000L
    val ev = Seq(
      // user 1: click day 0, purchase day 3 (inside 7d) -> attributed day 0
      (1L, 1L, 0L * day + 5L, "click", 10.0),
      (1L, 2L, 3L * day, "purchase", 20.0),
      // user 2: click day 0, purchase day 10 (outside 7d) -> unattributed
      (2L, 3L, 0L * day, "click", 1.0),
      (2L, 4L, 10L * day, "purchase", 30.0),
      // user 3: purchase with no prior click -> unattributed
      (3L, 5L, 2L * day, "purchase", 5.5)
    ).toDF("user_id", "event_id", "tsn", "event_type", "value")
    val got = Events.lastTouchAttribution(ev)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((-1L, 2L, 3550L), (0L, 1L, 2000L)), s"got $got")
  }

  test("rfmSegments: deterministic ntile buckets over the user rollup") {
    import graft.pipeline.Events
    val day = 86400000000L
    // 4 users, q=2: user A high-everything, user D low-everything
    val ev = Seq(
      (1L, 1L, 9L * day, "purchase", 100.0), (1L, 2L, 9L * day + 1, "purchase", 100.0),
      (2L, 3L, 8L * day, "purchase", 50.0), (2L, 4L, 8L * day + 1, "purchase", 50.0),
      (3L, 5L, 2L * day, "purchase", 10.0),
      (4L, 6L, 1L * day, "purchase", 1.0)
    ).toDF("user_id", "event_id", "tsn", "event_type", "value")
    val got = Events.rfmSegments(ev, q = 2)
      .select("r_q", "f_q", "m_q", "users")
      .as[(Long, Long, Long, Long)].collect().toSet
    // users 1,2 (recent, frequent, big) land in bucket 1 on all axes;
    // users 3,4 in bucket 2
    assert(got == Set((1L, 1L, 1L, 2L), (2L, 2L, 2L, 2L)), s"got $got")
  }

  test("strPack: STR invariants — page fill, slab geometry, MBR disjointness in x") {
    import graft.plans.SpatialLayout
    val n = 1000; val cap = 16
    val pts = (0 until n).map { i =>
      (i.toString, (i * 37 % 100).toDouble, (i * 59 % 83).toDouble)
    }.toDF("id", "x", "y")
    val pagesDf = SpatialLayout.strPack(pts, cap)
    val pages = pagesDf.collect()
    // every point lands in exactly one page
    assert(pages.map(_.getAs[Long]("cnt")).sum == n)
    // no page exceeds capacity, and the expected page count holds
    assert(pages.forall(_.getAs[Long]("cnt") <= cap))
    val expPages = (n + cap - 1) / cap
    assert(pages.length == expPages, s"got ${pages.length} want $expPages")
    // slabs partition the x-rank: a slab's xmin must be >= every earlier
    // slab's xmax (x-sorted slabs are x-disjoint up to tie values)
    val bySlab = pages.groupBy(_.getAs[Long]("slab")).toSeq.sortBy(_._1)
    bySlab.sliding(2).foreach {
      case Seq((_, a), (_, b)) =>
        assert(b.map(_.getAs[Double]("xmin")).min >= a.map(_.getAs[Double]("xmax")).max - 1e-9)
      case _ =>
    }
    // within a slab, tiles are y-disjoint the same way
    bySlab.foreach { case (_, tiles) =>
      tiles.sortBy(_.getAs[Long]("tile")).toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b.getAs[Double]("ymin") >= a.getAs[Double]("ymax") - 1e-9)
        case _ =>
      }
    }
  }

  test("bqTopK: sign signature, self-match at hamming 0, shortlist recall") {
    import graft.pipeline.Similarity
    val dim = 64
    def mk(seed: Int): Array[Float] = {
      val r = new java.util.Random(seed)
      Array.fill(dim)(r.nextGaussian().toFloat)
    }
    val base = mk(7)
    val vecs = Seq(
      (0L, base.toSeq),                                  // the query itself
      (1L, base.map(v => v * 0.5f).toSeq),               // same signs, cos ≈ 1
      (2L, base.map(v => -v).toSeq),                     // all 64 bits flipped
      (3L, mk(11).toSeq), (4L, mk(12).toSeq), (5L, mk(13).toSeq))
    val df = vecs.toDF("vec_id", "embedding")
    // signature: bit b == sign of dim b
    val sig = df.filter($"vec_id" === 0)
      .select(Similarity.bqSig($"embedding", dim)).head().getLong(0)
    base.zipWithIndex.foreach { case (v, b) =>
      assert(((sig >> b) & 1L) == (if (v >= 0) 1L else 0L), s"bit $b")
    }
    val q = base.map(_.toDouble)
    val top = Similarity.bqTopK(df, "vec_id", "embedding", q,
      k = 3, dim = dim, shortlist = 4).collect()
    // ids 0 and 1 have hamming 0 (identical signs) and cosine 1.0
    assert(top.take(2).map(_.getLong(0)).toSet == Set(0L, 1L))
    assert(top.take(2).forall(r => r.getInt(1) == 0 && r.getDouble(2) == 1.0))
    // the negated vector is hamming 64 — with shortlist 4 of 6 it must not
    // survive the Hamming cut
    assert(!top.map(_.getLong(0)).contains(2L))
  }

  test("holtForecast: hand-checked fold, init contract, forecast line") {
    import graft.pipeline.Events
    // two series: constant 10/day (level 10, trend → 0-ish) and a hand fold
    val rows = (0 until 4).flatMap { d =>
      val ts = d * 86400000000000L + 1000L
      Seq.fill(10)(("flat", ts)) ++ Seq.fill(d + 1)(("ramp", ts))
    }
    val ev = rows.toDF("event_type", "ts")
    val got = Events.holtForecast(ev).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // flat: l=10, every step lNew = 0.5*10 + 0.5*(l+b) stays 10 with b=0
    assert(got("flat") == ((10.0, 0.0)))
    // ramp counts 1,2,3,4 — replay the recurrence by hand
    var l = 1.0; var b = 0.0
    Seq(2, 3, 4).foreach { y =>
      val ln = 0.5 * y + 0.5 * (l + b)
      b = 0.5 * (ln - l) + 0.5 * b; l = ln
    }
    assert(got("ramp") == ((math.rint(l * 1e6) / 1e6, math.rint(b * 1e6) / 1e6)))
  }

  test("bfsPerSource: per-root hops are independent and settle-first") {
    import graft.pipeline.Graphs
    // path 1-2-3-4 plus shortcut 1-4; roots 1 and 3
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(1L, 3L).toDF("node")
    val got = Graphs.bfsPerSource(edges, seeds, maxHop = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val exp = Map(
      (1L, 1L) -> 0, (1L, 2L) -> 1, (1L, 4L) -> 1, (1L, 3L) -> 2,
      (3L, 3L) -> 0, (3L, 2L) -> 1, (3L, 4L) -> 1, (3L, 1L) -> 2)
    assert(got == exp)
  }

  test("sp_line_interpolate matches JTS LengthIndexedLine on the real layer") {
    import org.locationtech.jts.geom.Coordinate
    import org.locationtech.jts.linearref.LengthIndexedLine
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("sp_line_interpolate")(spark, dir).collect()
    assert(got.nonEmpty)
    // rebuild each nation polyline in JTS and compare the interpolated point
    val pts = spark.read.parquet(s"$dir/customer.parquet")
      .select($"c_nationkey",
        $"c_custkey".as("ck"),
        (($"c_custkey" % 360) - 180 + 0.5).cast("double").as("x"),
        ((($"c_custkey" * 7) % 180) - 90 + 0.5).cast("double").as("y"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val byNation = pts.groupBy(_._1).map { case (nk, rs) =>
      nk -> rs.sortBy(_._2).map(r => new Coordinate(r._3, r._4)).toArray
    }
    got.foreach { r =>
      val (nk, frac, px, py) =
        (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      val line = GeomCodec.factory.createLineString(byNation(nk))
      val p = new LengthIndexedLine(line)
        .extractPoint(frac * line.getLength)
      assert(math.abs(p.x - px) < 1e-6 && math.abs(p.y - py) < 1e-6,
        s"nation $nk frac $frac: got ($px,$py) jts (${p.x},${p.y})")
    }
  }

  test("brandesBetweenness: exact scores on a path graph") {
    import graft.pipeline.Graphs
    // path 1-2-3-4-5, every node a root, depth covers the diameter.
    // directed-pair betweenness (each unordered pair counted both ways):
    // node 2 = 6, node 3 = 8, node 4 = 6, endpoints 0
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = (1L to 5L).toDF("node")
    val got = Graphs.brandesBetweenness(edges, seeds, maxHop = 4, k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 0.0, 2L -> 6.0, 3L -> 8.0, 4L -> 6.0, 5L -> 0.0))
  }

  test("brandesBetweenness: sigma splits across equal-length paths") {
    import graft.pipeline.Graphs
    // diamond 1→{2,3}→4: every node sits on exactly one pair's two
    // equal-length shortest paths (2/3 carry 1↔4, 1/4 carry 2↔3), so each
    // δ contribution is σv/σw = 1/2 per direction → betweenness 1 for all
    val und = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = (1L to 4L).toDF("node")
    val got = Graphs.brandesBetweenness(edges, seeds, maxHop = 2, k = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0, 4L -> 1.0))
  }

  test("seasonalDecompose: weekly spike recovered exactly, zero residual") {
    import graft.pipeline.Events
    // counts 17 on weekday 0, 10 otherwise → any full 7-window sums to 77,
    // d7 = 7n − 77: weekday 0 → 42 (seasonal 6), others → −7 (seasonal −1),
    // residual variance 0 everywhere
    val rows = (0 until 21).flatMap { d =>
      val n = if (d % 7 == 0) 17 else 10
      Seq.fill(n)(("load", d * 86400000000000L + 5L))
    }
    val got = Events.seasonalDecompose(rows.toDF("event_type", "ts")).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (wd, seasonal, rv) = (r.getLong(1), r.getDouble(3), r.getDouble(4))
      assert(seasonal == (if (wd == 0) 6.0 else -1.0), r.toString)
      assert(rv == 0.0, r.toString)
    }
  }

  test("kaplanMeier: hand curve with right-censoring") {
    import graft.pipeline.Events
    val day = 86400000000000L
    // u1,u2 churn at 10d; u3 at 20d; u4's last event is the corpus max →
    // censored (within the 7-day window), so it leaves the risk set silently
    val rows = Seq(
      (1L, 0L), (1L, 10 * day),
      (2L, 0L), (2L, 10 * day),
      (3L, 0L), (3L, 20 * day),
      (4L, 0L), (4L, 29 * day))
    val got = Events.kaplanMeier(rows.toDF("user_id", "ts"), censorDays = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((10L, 4L, 2L, 0.5), (20L, 2L, 1L, 0.25)))
  }

  test("sim_rq: the residual stage reduces reconstruction error") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("sim_rq")(spark, dir).collect()
    assert(got.length == 15)
    // the query vector itself (id 0) must be retrieved with cosine 1.0
    assert(got(0).getLong(0) == 0L && got(0).getDouble(2) == 1.0, got(0).toString)
    // est is a codebook approximation: within [-1, 1] and correlated with
    // the exact cosine for the top hit
    assert(got.forall(r => math.abs(r.getDouble(1)) <= 1.0))
    assert(got(0).getDouble(1) > 0.5, got(0).toString)
  }

  test("hardNegatives: picks nearest same-label and nearest cross-label") {
    import graft.pipeline.Similarity
    val vecs = Seq(
      (0L, Seq(1f, 0f), 1),       // anchor, label 1
      (1L, Seq(0.9f, 0.1f), 1),   // same label, close → positive
      (2L, Seq(0.95f, 0.05f), 2), // other label, closest → hard negative
      (3L, Seq(0f, 1f), 2))       // other label, far
    val df = vecs.toDF("vec_id", "embedding", "label")
    val r = Similarity.hardNegatives(df, "vec_id", "embedding", "label",
      nAnchors = 1).collect()
    assert(r.length == 1)
    assert(r(0).getLong(2) == 1L, r(0).toString)  // pos_id
    assert(r(0).getLong(4) == 2L, r(0).toString)  // neg_id
    assert(r(0).getDouble(5) > r(0).getDouble(3) - 1.0) // both cosines present
  }

  test("gr_effdiam: interpolated d90 on the real layer is inside the hop bound") {
    val got = SparkEntry.queries("gr_effdiam")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(got.length == 1)
    val (n, h90, d90) = (got(0).getLong(0), got(0).getLong(1), got(0).getDouble(2))
    assert(n > 0 && h90 >= 1 && h90 <= 3)
    assert(d90 > (h90 - 1).toDouble && d90 <= h90.toDouble, s"d90=$d90 h90=$h90")
  }

  test("mmrTopK: duplicate hit is demoted below a diverse one") {
    import graft.pipeline.Similarity
    // b duplicates a (the top hit); with a diversity-heavy λ the sim
    // penalty pushes the diverse c ahead of the duplicate. (When the query
    // is itself the top hit, any candidate's sim-to-it equals its rel, so
    // score = λ·rel − (1−λ)·sim demotes duplicates only when λ < 0.5 —
    // the λ=0.3 here exercises that regime; the driver query's λ=0.7 is
    // the relevance-heavy production default.)
    val vecs = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),        // a = the query
      (2L, Seq(1f, 0f, 0f, 0f)),        // b = exact duplicate of a
      (3L, Seq(0.6f, 0.8f, 0f, 0f)))    // c: rel 0.6, diverse
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.mmrTopK(df, "vec_id", "embedding",
      Array(1.0, 0.0, 0.0, 0.0), k = 3, lambda = 0.3, shortlist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // pure relevance would give 1, 2, 3; MMR gives 1, 3, 2:
    // score(b) = 0.3·1 − 0.7·1 = −0.4 < score(c) = 0.3·0.6 − 0.7·0.6 = −0.24
    assert(got.toSeq == Seq((1L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("distinctN: hand-counted n-gram totals and uniques") {
    import graft.pipeline.Corpus
    val docs = Seq((1L, "a b a b", "s"), (2L, "c", "s"))
      .toDF("doc_id", "text", "source")
    val got = Corpus.distinctN(docs, "source", "text").collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // unigrams: a b a b c → 5 total, 3 unique; bigrams (within docs):
    // "a b","b a","a b" → 3 total, 2 unique; trigrams: 2 total, 2 unique
    assert(got(1L) == ((5L, 3L, 0.6)))
    assert(got(2L) == ((3L, 2L, math.rint(2.0 / 3.0 * 1e6) / 1e6)))
    assert(got(3L) == ((2L, 2L, 1.0)))
  }

  test("plan contracts: hop single-generator shuffle, q18 TakeOrdered, zipf TakeOrdered, multitouch no cartesian") {
    import graft.pipeline.{Corpus, Events}
    val ev = spark.range(5000).select((col("id") % 50).as("user_id"),
      col("id").as("event_id"), expr("id * 3600000000000 div 7").as("ts"),
      element_at(array(lit("click"), lit("purchase")),
        (col("id") % 2 + 1).cast("int")).as("event_type"),
      (col("id") % 100).cast("double").as("value"))
    // hoppingCounts: the generator runs in the scan projection — no
    // exchange before the first aggregate, no single-partition stage
    val hPlan = Events.hoppingCounts(ev).queryExecution.executedPlan.toString()
    assert(!hPlan.contains("SinglePartition"), hPlan)
    assert(hPlan.contains("Generate explode"), hPlan)
    // multi-touch: the band join is keyed on user_id, never cartesian
    val mPlan = Events.multiTouchAttribution(
        ev.withColumnRenamed("ts", "tsn"))
      .queryExecution.executedPlan.toString()
    assert(!mPlan.contains("CartesianProduct")
      && !mPlan.contains("BroadcastNestedLoop"), mPlan)
    // q18 shape: top-20 plans as TakeOrderedAndProject, never a global sort
    val li = spark.range(3000).select((col("id") % 700).as("l_orderkey"),
      (col("id") % 60 + 1).cast("double").as("l_quantity"))
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).cast("long").as("total_qty"))
      .filter(col("total_qty") > 100)
      .orderBy(col("total_qty").desc, col("l_orderkey")).limit(20)
    assert(big.queryExecution.executedPlan.toString()
      .contains("TakeOrderedAndProject"))
    // zipf: the corpus-volume cut is a TakeOrdered, the OLS window runs
    // after the limit
    val docs = (1 to 50).map(i => (i.toLong, s"a b c w$i")).toDF("doc_id", "text")
    val zPlan = Corpus.zipfFit(docs, "text", topN = 10)
      .queryExecution.executedPlan.toString()
    assert(zPlan.contains("TakeOrderedAndProject"), zPlan)
  }

  test("multiTouchAttribution: largest-remainder split is exact and lossless") {
    import graft.pipeline.Events
    val us = 1000000L
    // user 1: purchase of 1.00 (100 cents) with 3 clicks in window →
    // splits 34/33/33 (first touch gets the remainder cent);
    // user 2: purchase with no touch → day -1 keeps the full 55
    val rows = Seq(
      (1L, 10L, 1L * us, "click", 0.0),
      (1L, 11L, 2L * us, "click", 0.0),
      (1L, 12L, 3L * us, "click", 0.0),
      (1L, 13L, 4L * us, "purchase", 1.00),
      (2L, 20L, 5L * us, "purchase", 0.55))
    val ev = rows.toDF("user_id", "event_id", "tsn", "event_type", "value")
    val got = Events.multiTouchAttribution(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // all three touches are on day 0; credits 34+33+33 = 100 — lossless
    assert(got.toSeq == Seq((-1L, 1L, 55L), (0L, 3L, 100L)))
  }

  test("giniRevenue: equality → 0, winner-take-all → (n−1)/n") {
    import graft.pipeline.Events
    def ev(cents: Seq[Long]) = cents.zipWithIndex.map { case (c, u) =>
      (u.toLong, u.toLong * 86400000000000L, "purchase", c / 100.0)
    }.toDF("user_id", "ts", "event_type", "value")
    val eq = Events.giniRevenue(ev(Seq(500L, 500L, 500L, 500L))).collect()(0)
    assert(eq.getLong(0) == 4L && eq.getDouble(2) == 0.0)
    val wta = Events.giniRevenue(ev(Seq(0L, 0L, 0L, 1000L))).collect()(0)
    assert(wta.getDouble(2) == 0.75) // (n−1)/n with n = 4
  }

  test("hoppingCounts: each event lands in exactly width windows") {
    import graft.pipeline.Events
    val hr = 3600000000000L
    val ev = Seq((1L, 5 * hr + 7L, "view"), (2L, 6 * hr + 7L, "view"))
      .toDF("user_id", "ts", "event_type")
    val got = Events.hoppingCounts(ev, widthHours = 3).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    // event@5 covers windows 3,4,5; event@6 covers 4,5,6
    assert(got == Map(3L -> ((1L, 1L)), 4L -> ((2L, 2L)), 5L -> ((2L, 2L)),
      6L -> ((1L, 1L))))
  }

  test("madAnomalies: jittered baseline, exact median/MAD boundary") {
    import graft.pipeline.Events
    val hr = 3600000000000L
    // hours alternate 9/11 except the spike at h=12 (an even slot, so the
    // sample is 11 nines, 12 elevens, 100): median = (11+11)/2 = 11,
    // deviations = {0×12, 2×11, 89} → MAD = (0+2)/2 = 1;
    // mod-z = 0.6745·89 ≈ 60.0 ≫ 3.5 → exactly one flag
    val rows = (0 until 24).flatMap { h =>
      val n = if (h == 12) 100 else if (h % 2 == 0) 9 else 11
      Seq.fill(n)(("load", h * hr + 5L))
    }
    val got = Events.madAnomalies(rows.toDF("event_type", "ts")).collect()
    assert(got.length == 1 && got(0).getLong(1) == 12L)
    assert(math.abs(got(0).getDouble(3) - 0.6745 * 89.0) < 1e-6)
  }

  test("zipfFit: exact OLS on a hand-built rank-frequency line") {
    import graft.pipeline.Corpus
    // frequencies 4, 2, 1 at ranks 1, 2, 3
    val docs = Seq((1L, "w1 w1 w1 w1 w2 w2 w3")).toDF("doc_id", "text")
    val r = Corpus.zipfFit(docs, "text", topN = 10).collect()(0)
    assert(r.getLong(0) == 3L)
    // replay the OLS by hand
    val x = Seq(1, 2, 3).map(i => math.log(i.toDouble))
    val y = Seq(4, 2, 1).map(f => math.log(f.toDouble))
    val n = 3.0
    val (sx, sy) = (x.sum, y.sum)
    val sxx = x.map(v => v * v).sum
    val sxy = x.zip(y).map { case (a, b) => a * b }.sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getDouble(1) - slope) < 1e-6, r.toString)
    assert(r.getDouble(3) > 0.97)  // near-linear log-log (freq 4,2,1 isn't exact Zipf)
  }

  private val dayNs = 86400000000000L

  test("arFit: perfect AR(1) line y_t = y_{t-1} + 1 recovers phi=1, c=1, r2=1") {
    import graft.pipeline.Events
    // day d (0..11) carries d+1 events → consecutive pairs fit y = x + 1
    val rows = (0 until 12).flatMap { d =>
      Seq.fill(d + 1)(("load", d * dayNs + 7L))
    }
    val r = Events.arFit(rows.toDF("event_type", "ts")).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 11L)                       // n_pairs
    assert(r(0).getDouble(2) == 1.0, r(0).toString)      // phi
    assert(r(0).getDouble(3) == 1.0, r(0).toString)      // intercept
    assert(r(0).getDouble(4) == 1.0, r(0).toString)      // r2
    assert(r(0).getDouble(5) == 13.0, r(0).toString)     // next_fc = 1 + 1*12
  }

  test("cusum: level shift climbs the one-sided statistics and counts alarms") {
    import graft.pipeline.Events
    // 10 days at 10/day then 10 days at 30/day: mu=20, sigma=10, k=5, h=40
    val rows = (0 until 20).flatMap { d =>
      Seq.fill(if (d < 10) 10 else 30)(("load", d * dayNs + 7L))
    }
    val r = Events.cusum(rows.toDF("event_type", "ts")).collect()(0)
    assert(r.getLong(1) == 20L && r.getDouble(2) == 20.0 && r.getDouble(3) == 10.0)
    // manual fold: sn climbs 5/day for 10 days (alarm on days 9,10: 45,50),
    // then decays 15/day; sp climbs 5/day in the second half (alarms at 45,50)
    var sp = 0.0; var sn = 0.0; var al = 0L
    (0 until 20).foreach { d =>
      val y = if (d < 10) 10.0 else 30.0
      sp = math.max(0.0, sp + (y - 20.0 - 5.0))
      sn = math.max(0.0, sn + (20.0 - 5.0 - y))
      if (sp > 40.0 || sn > 40.0) al += 1
    }
    assert(r.getDouble(4) == sp && r.getDouble(5) == sn && r.getLong(6) == al,
      s"$r vs ($sp, $sn, $al)")
  }

  test("divergence: hand-computed KL/JS on a two-group two-word corpus") {
    import graft.pipeline.Corpus
    val docs = Seq((1L, "a a a b", "g1"), (2L, "a b b b", "g2"))
      .toDF("doc_id", "text", "lang")
    val got = Corpus.divergence(docs, "lang", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    // corpus q = (a: 4/8, b: 4/8); g1 p = (3/4, 1/4)
    def kl(p: Seq[Double], q: Seq[Double]) =
      p.zip(q).filter(_._1 > 0).map { case (pi, qi) => pi * math.log(pi / qi) }.sum
    val exp = kl(Seq(0.75, 0.25), Seq(0.5, 0.5))
    assert(math.abs(got("g1").getDouble(3) - exp) < 1e-6, got("g1").toString)
    assert(got("g1").getLong(1) == 2L && got("g1").getLong(2) == 4L)
    // symmetric corpus → both groups share the same divergence values
    assert(got("g1").getDouble(4) == got("g2").getDouble(4))
  }

  test("editVerifiedPairs: one edit inside a shared blocking prefix") {
    import graft.pipeline.Dedup
    val p = "x" * 32
    val docs = Seq((1L, p + " the cat sat"), (2L, p + " the cut sat"),
      (3L, "completely different prefix here")).toDF("doc_id", "text")
    val got = Dedup.editVerifiedPairs(docs, "doc_id", "text").collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 2L)
    assert(got(0).getLong(2) == 1L) // a→u substitution
    assert(math.abs(got(0).getDouble(3) - (1.0 - 1.0 / 44.0)) < 1e-6)
  }

  test("bleuPairs: identical documents score BLEU-2 = 1, disjoint score 0") {
    import graft.pipeline.Dedup
    val p = "y" * 32
    val docs = Seq((1L, p + " one two three"), (2L, p + " one two three"),
      (4L, p + " four five six seven")).toDF("doc_id", "text")
    val got = Dedup.bleuPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val same = got((1L, 2L))
    assert(same.getDouble(4) == 1.0 && same.getDouble(5) == 1.0 &&
      same.getDouble(6) == 1.0, same.toString)
    // 1 vs 4: only the prefix token is shared; bigram matches = 0 → bleu 0
    val diff = got((1L, 4L))
    assert(diff.getLong(2) == 1L && diff.getLong(3) == 0L &&
      diff.getDouble(6) == 0.0, diff.toString)
  }

  test("paretoDeciles and ebConversion: exact shares and shrinkage ranking") {
    import graft.pipeline.Events
    // 10 users, user u emits u+1 events of value 1.0 → 55 events
    val rows = (0 until 10).flatMap { u =>
      (0 to u).map(i => (u.toLong, i * dayNs + 1L,
        if (i == 0) "purchase" else "view", 1.0))
    }
    val df = rows.toDF("user_id", "ts", "event_type", "value")
    val deciles = Events.paretoDeciles(df).collect()
    assert(deciles.length == 10 && deciles.forall(_.getLong(1) == 1L))
    assert(deciles(0).getLong(2) == 10L) // top decile = heaviest user
    assert(math.abs(deciles(0).getDouble(4) - 10.0 / 55.0) < 1e-6)
    // shrinkage: a 1/1 user must rank below a 95/100 user even though the
    // raw rate says otherwise
    val ebRows = Seq((1L, 1L, "purchase", 1.0)) ++
      (0 until 100).map(i => (2L, i * dayNs + 1L,
        if (i < 95) "purchase" else "view", 1.0)) ++
      (0 until 100).map(i => (3L, i * dayNs + 2L, "view", 1.0))
    val eb = Events.ebConversion(
      ebRows.toDF("user_id", "ts", "event_type", "value"), m = 20, k = 10)
      .collect()
    assert(eb(0).getLong(0) == 2L, eb.map(_.toString).mkString(";"))
    assert(eb(0).getDouble(3) < eb(1).getDouble(3)) // raw rate disagrees
  }

  test("sp_voronoi: cells partition the point set exactly") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("sp_voronoi")(spark, dir).collect()
    assert(got.nonEmpty)
    val nPts = got.map(_.getLong(1)).sum
    val nCust = spark.read.parquet(s"$dir/customer.parquet").count()
    assert(nPts == nCust, s"$nPts vs $nCust")
  }

  test("plan contracts: voronoi broadcast argmin, walks keyed join, divergence map-side counts, bleu no cartesian") {
    import graft.pipeline.{Corpus, Dedup, Graphs}
    // sp_voronoi shape: sites broadcast, per-point argmin is an aggregate
    // (map-side combinable struct-min), never a window over the fan-out
    val vPlan = SparkEntry.queries("sp_voronoi")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString()
    assert(vPlan.contains("BroadcastHashJoin") || vPlan.contains("BroadcastExchange"), vPlan)
    assert(!vPlan.contains("CartesianProduct"), vPlan)
    assert(!vPlan.contains("WindowExec"), vPlan)
    // gr_walks: every step is an edges-keyed equi-join + aggregate argmin
    val edges = spark.range(200).select((col("id") % 40).as("src"),
      ((col("id") * 7) % 40).as("dst"))
    val seeds = spark.range(5).select(col("id").as("node"))
    val wPlan = Graphs.hashWalks(edges, seeds, steps = 3)
      .queryExecution.executedPlan.toString()
    assert(!wPlan.contains("CartesianProduct")
      && !wPlan.contains("BroadcastNestedLoop"), wPlan)
    // tx_kl: the (group, word) and word counts are partial-aggregated
    // before their exchanges (map-side combine on the corpus volume)
    val docs = (1 to 40).map(i => (i.toLong, s"w$i a b", if (i % 2 == 0) "g1" else "g2"))
      .toDF("doc_id", "text", "lang")
    val kPlan = Corpus.divergence(docs, "lang", "text")
      .queryExecution.executedPlan.toString()
    assert(kPlan.contains("partial_count") || kPlan.contains("HashAggregate"), kPlan)
    assert(!kPlan.contains("CartesianProduct"), kPlan)
    // q19: Catalyst's CNF extraction must push each table's OR-disjunction
    // to ITS scan — quantity bounds reach lineitem, brand/size reach part
    val qPlan = SparkEntry.queries("q19_disjunct")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString()
    assert(qPlan.contains("PushedFilters: [IsNotNull(l_partkey), Or(Or(And(GreaterThanOrEqual(l_quantity"), qPlan)
    assert(qPlan.contains("Or(Or(And(EqualTo(p_brand,Brand#1)"), qPlan)
    // tx_bleu: gram joins are keyed, never cartesian
    val p = "z" * 32
    val bdocs = Seq((1L, p + " one two"), (2L, p + " one two three"))
      .toDF("doc_id", "text")
    val bPlan = Dedup.bleuPairs(bdocs, "doc_id", "text")
      .queryExecution.executedPlan.toString()
    assert(!bPlan.contains("CartesianProduct")
      && !bPlan.contains("BroadcastNestedLoop"), bPlan)
  }

  test("spatial statistics invariants: skyline dominance, ripley monotonicity, moran symmetry") {
    val dir = "/root/testdata/sf0.001"
    // skyline: along increasing d2 the cents on the front never decrease
    // (a later point with lower cents would be strictly dominated)
    val sky = SparkEntry.queries("sp_skyline")(spark, dir).collect()
    assert(sky.nonEmpty)
    sky.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byD = rows.sortBy(_.getDouble(3))
      byD.sliding(2).foreach { w =>
        if (w.length == 2 && w(0).getDouble(3) < w(1).getDouble(3))
          assert(w(0).getLong(2) <= w(1).getLong(2), w.mkString(";"))
      }
    }
    // ripley: pair counts are monotone in the radius
    val rip = SparkEntry.queries("sp_ripley")(spark, dir).collect()
    assert(rip.length == 4)
    rip.sliding(2).foreach(w =>
      assert(w(0).getLong(1) <= w(1).getLong(1), w.mkString(";")))
    // moran: queen adjacency is symmetric → the directed pair count is even
    val mor = SparkEntry.queries("sp_moran")(spark, dir).collect()(0)
    assert(mor.getLong(1) % 2 == 0, mor.toString)
    assert(math.abs(mor.getDouble(2)) <= 1.5, mor.toString)
  }

  test("gr_walks: step 0 is the seed and every hop follows a real edge") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("gr_walks")(spark, dir).collect()
    assert(got.nonEmpty)
    val bySeed = got.groupBy(_.getLong(0))
    bySeed.foreach { case (seed, rows) =>
      val path = rows.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(path.head == seed, s"$seed -> ${path.mkString(",")}")
    }
    // rebuild the edge set and check adjacency of consecutive steps
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val or = spark.read.parquet(s"$dir/orders.parquet")
    val eraw = li.join(or, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("s"), (col("l_suppkey") * 2 + 1).as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val und = eraw ++ eraw.map(_.swap)
    bySeed.values.foreach { rows =>
      val path = rows.sortBy(_.getLong(1)).map(_.getLong(2))
      path.sliding(2).foreach { st =>
        if (st.length == 2) assert(und.contains((st(0), st(1))), st.mkString("->"))
      }
    }
  }

  test("tx_templates: planted boilerplate variants dominate document frequency") {
    val got = SparkEntry.queries("tx_templates")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(got.length == 20)
    val planted = got.filter(_.getString(0).contains("boilerplate"))
    assert(planted.nonEmpty && planted.head.getLong(1) >= 3, got.take(3).mkString(";"))
  }

  test("closing invariants: spatial gini bounds, new-vs-returning conservation, burstiness >= 1, q22 anti-join") {
    val dir = "/root/testdata/sf0.001"
    val gini = SparkEntry.queries("sp_gini")(spark, dir).collect()(0)
    assert(gini.getDouble(2) >= 0.0 && gini.getDouble(2) <= 1.0, gini.toString)
    val nCust = spark.read.parquet(s"$dir/customer.parquet").count()
    assert(gini.getLong(1) == nCust)
    // new+returning events sum to the log; first day has no returning users
    val nvr = SparkEntry.queries("ev_new_returning")(spark, dir).collect()
    val nEv = spark.read.parquet(s"$dir/events.parquet").count()
    assert(nvr.map(r => r.getLong(3) + r.getLong(4)).sum == nEv)
    assert(nvr.head.getLong(2) == 0L, nvr.head.toString)
    // burstiness = tf/df >= 1 always (tf counts every occurrence, df docs)
    val burst = SparkEntry.queries("tx_burstiness")(spark, dir).collect()
    assert(burst.forall(r => r.getDouble(3) >= 1.0))
    assert(burst.forall(r => r.getLong(1) >= r.getLong(2)))
    // q22: no selected customer may have any order
    val idle = SparkEntry.queries("q22_idle_rich")(spark, dir).collect()
    assert(idle.map(_.getLong(1)).sum <= nCust)
    assert(idle.forall(_.getLong(1) > 0))
  }

  test("holtWinters: constant series settles at level=c, zero trend/seasonals") {
    import graft.pipeline.Events
    val rows = (0 until 21).flatMap { d => Seq.fill(6)(("load", d * dayNs + 7L)) }
    val r = Events.holtWinters(rows.toDF("event_type", "ts")).collect()(0)
    assert(r.getDouble(1) == 6.0 && r.getDouble(2) == 0.0, r.toString)
    (3 to 9).foreach(i => assert(r.getDouble(i) == 0.0, r.toString))
  }
}
