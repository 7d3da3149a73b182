package graft

import org.apache.spark.sql.functions._
import graft.engine.{GeoFrame, SpatialAggs}
import graft.functions.st
import graft.geom.GeomCodec

/** Layer-verb tests, including the reference's golden grid contract
  * (reference: server-plugin/src/test/.../RTreeBulkInsertTest.java:269-278):
  * uniform width² grid at (i/width, j/width), query box (0.5,0.5)-(0.52,0.52)
  * → 9 matched / 1 strictly contained for width=100.
  */
class GeoFrameSpec extends SparkSpec {
  import spark.implicits._

  private def mkGrid(width: Int): GeoFrame = {
    val df = spark.range(width.toLong * width)
      .withColumn("x", (col("id") % width).cast("double") / width)
      .withColumn("y", floor(col("id") / width).cast("double") / width)
      .withColumn("id", col("id").cast("string"))
      .withColumn("geometry", st.makePoint(col("x"), col("y")))
      .withColumn("gtype", lit(GeomCodec.GTYPE_POINT))
      .withColumn("bbox", st.bboxStruct(col("x"), col("y"), col("x"), col("y")))
    new GeoFrame(df)
  }

  test("RTreeBulkInsertTest very_small grid: 9 matched, 1 contained") {
    val layer = mkGrid(100)
    assert(layer.intersectsWindow(0.5, 0.5, 0.52, 0.52).count() == 9)
    // bboxSearch = WITHIN semantics (strict interior for points)
    assert(layer.bboxSearch(0.5, 0.5, 0.52, 0.52).count() == 1)
  }

  test("RTreeBulkInsertTest full size ladder: 36/121/256 matched, 16/81/196 contained") {
    // the reference's remaining rungs (small/medium/large — widths 250/500/
    // 750, i.e. 62.5k/250k/562.5k points; RTreeBulkInsertTest.java:269-278).
    // Strictly-contained counts equal the reference on every rung. For the
    // envelope-inclusive count the reference pins 9/35/121/256; the
    // set-theoretic inclusive count is 9/36/121/256 (at width 250 the six
    // per-axis values {125..130}/250 all land inside [0.5, 0.52] in IEEE
    // doubles — 6x6 = 36). Three of their four rungs agree with the
    // arithmetic; the 35 is an artifact of their R-tree monitor's
    // per-traversal counting, which does not transfer to a scan-based
    // index, so we pin the arithmetic truth here
    for ((width, matched, contained) <- Seq((250, 36, 16), (500, 121, 81), (750, 256, 196))) {
      val layer = mkGrid(width)
      assert(layer.intersectsWindow(0.5, 0.5, 0.52, 0.52).count() == matched,
        s"width=$width matched")
      assert(layer.bboxSearch(0.5, 0.5, 0.52, 0.52).count() == contained,
        s"width=$width contained")
    }
  }

  test("withinDistance returns sorted ascending distances under the limit") {
    val layer = mkGrid(50)
    val rows = layer.withinDistanceKm(0.5, 0.5, 10.0)
      .df.select("distance").as[Double].collect()
    assert(rows.nonEmpty)
    assert(rows.sameElements(rows.sorted))
    assert(rows.forall(_ <= 10.0))
  }

  test("closestPoints returns k ascending") {
    val layer = mkGrid(50)
    val d = layer.closestPoints(0.5, 0.5, 7).df.select("distance").as[Double].collect()
    assert(d.length == 7)
    assert(d.sameElements(d.sorted))
  }

  test("intersects/within/contains against a polygon") {
    val layer = mkGrid(10) // points at 0, .1, ..., .9
    val n = layer.intersects("POLYGON ((0.05 0.05, 0.35 0.05, 0.35 0.35, 0.05 0.35, 0.05 0.05))").count()
    assert(n == 9) // x,y in {.1,.2,.3}
  }

  test("minOf/maxOf keep all ties and drop nulls") {
    val df = Seq(
      ("a", Some(1.0)), ("b", Some(3.0)), ("c", Some(3.0)), ("d", None), ("e", Some(2.0))
    ).toDF("id", "v")
    val layer = new GeoFrame(df)
    assert(layer.maxOf("v").df.select("id").as[String].collect().toSet == Set("b", "c"))
    assert(layer.minOf("v").df.select("id").as[String].collect().toSet == Set("a"))
  }

  test("unionAll fold dedups identical points") {
    val df = Seq((1.0, 1.0), (1.0, 1.0), (2.0, 2.0))
      .toDF("x", "y").withColumn("geometry", st.makePoint(col("x"), col("y")))
    val g = GeomCodec.fromWkb(
      df.agg(SpatialAggs.unionAgg(col("geometry"))).head().getAs[Array[Byte]](0))
    assert(g.getNumGeometries == 2)
  }

  test("intersectAll fold") {
    val df = Seq(
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
      "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))",
      "POLYGON ((3 0, 7 0, 7 7, 3 7, 3 0))").toDF("wkt")
      .withColumn("geometry", st.geomFromText(col("wkt")))
    val g = GeomCodec.fromWkb(
      df.agg(SpatialAggs.intersectAgg(col("geometry"))).head().getAs[Array[Byte]](0))
    // intersection = [3,4]x[2,4] → area 2
    assert(math.abs(g.getArea - 2.0) < 1e-9)
  }

  test("densityIslandsExact reproduces greedy single-link semantics") {
    // order matters: a(0,0), b(0,0.5), c(10,10), d(0,1.0) with density 0.6:
    // b joins a's island; d joins (a∪b) island (distance to b = 0.5); c alone
    val df = Seq(
      ("a", 0.0, 0.0), ("b", 0.0, 0.5), ("c", 10.0, 10.0), ("d", 0.0, 1.0)
    ).toDF("id", "x", "y").withColumn("geometry", st.makePoint(col("x"), col("y")))
    val islands = SpatialAggs.densityIslandsExact(df, 0.6)
      .select("n_members").as[Long].collect().sorted
    assert(islands.toSeq == Seq(1L, 3L))
  }

  test("densityIslandsScalable finds same components as exact transitive closure") {
    val df = Seq(
      ("a", 0.0, 0.0), ("b", 0.0, 0.5), ("c", 10.0, 10.0), ("d", 0.0, 1.0)
    ).toDF("id", "x", "y")
      .withColumn("geometry", st.makePoint(col("x"), col("y")))
      .withColumn("bbox", st.bboxStruct(col("x"), col("y"), col("x"), col("y")))
    val islands = SpatialAggs.densityIslandsScalable(df, 0.6)
      .select("n_members").as[Long].collect().sorted
    assert(islands.toSeq == Seq(1L, 3L))
  }

  test("extractPoints explodes coordinates with -pointN ids") {
    val df = Seq(("l1", "LINESTRING (0 0, 1 1, 2 2)")).toDF("id", "wkt")
      .withColumn("geometry", st.geomFromText(col("wkt")))
    val out = new GeoFrame(df).extractPoints.df.select("id").as[String].collect()
    assert(out.toSet == Set("l1-point0", "l1-point1", "l1-point2"))
  }

  test("range slice mirrors RangeFilterPipe") {
    val df = spark.range(10).select(col("id").cast("string").as("id"))
    val out = new GeoFrame(df.orderBy("id")).range(2, 5).df.count()
    assert(out == 4) // rows 2..5 inclusive
  }

  test("sortBy nulls first") {
    val df = Seq(("a", Some(2.0)), ("b", None), ("c", Some(1.0))).toDF("id", "v")
    val out = new GeoFrame(df).sortBy("v").df.select("id").as[String].collect()
    assert(out.head == "b")
  }

  test("closestEdges snaps to nearest point on linestring") {
    val df = Seq(("l1", "LINESTRING (0 0, 10 0)")).toDF("id", "wkt")
      .withColumn("geometry", st.geomFromText(col("wkt")))
      .withColumn("bbox", st.bboxOf(col("geometry")))
    val r = new GeoFrame(df).closestEdges(5.0, 2.0, 5.0).df
      .select("snap_distance").as[Double].head()
    assert(math.abs(r - 2.0) < 1e-9) // snapped point is (5,0)
  }

  test("gridHeatmap bins points exactly and sums values in decimal") {
    val pts = Seq(
      (-179.5, -89.5, 10.10), (-170.1, -85.0, 0.01), // both in cell (0,0) @15°
      (0.5, 0.5, 1.11),                              // cell (12,6)
      (14.9, 14.9, 2.22), (0.1, 14.0, 3.33),         // also cell (12,6)
      (179.5, 89.5, 5.05))                           // cell (23,11)
      .toDF("x", "y", "v")
    val out = SpatialAggs.gridHeatmap(pts, "v", cellDeg = 15.0)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (0L, 0L, 2L, 10.11),
      (12L, 6L, 3L, 6.66),
      (23L, 11L, 1L, 5.05)))
  }

  test("zonalStats clips polygons per cell with exact areas; bbox-only cells drop") {
    // 10° cells from (-180,-90). Square [2.5,7.5]×[2.5,7.5] (area 25) spans
    // cells (18,9),(18,9)… x: cells 18 [0,10) and … entirely inside cell
    // (18,9)? x 2.5..7.5 ⊂ [0,10), y too → ONE cell, area 25.
    // Rect [-5,5]×[2,6]: splits across x cells 17 [-10,0) and 18 [0,10):
    // areas 5*4=20 each side → (17,9):20, (18,9):20.
    // L-shape polygon whose bbox covers cell (0,0) but geometry doesn't:
    // union-like ring around the corner — use a triangle far from cell
    // (0,0)'s corner: triangle (-179.9,-89.9) (-179.8,-89.9) (-179.9,-89.8)
    // is IN cell (0,0) with area 0.005 — instead craft bbox-overhang:
    // thin diagonal strip from (-175,-85) to (-165,-75): its bbox covers 4
    // cells but the strip's clipped area in the off-diagonal cells is 0.
    val wkts = Seq(
      (1L, "POLYGON ((2.5 2.5, 7.5 2.5, 7.5 7.5, 2.5 7.5, 2.5 2.5))"),
      (2L, "POLYGON ((-5 2, 5 2, 5 6, -5 6, -5 2))"))
      .toDF("id", "wkt")
    val polys = wkts
      .withColumn("geometry", st.geomFromText(col("wkt")))
      .withColumn("bbox", st.bboxOf(col("geometry")))
    val out = SpatialAggs.zonalStats(polys, cellDeg = 10.0)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (17L, 9L, 1L, 20.0),
      (18L, 9L, 2L, 45.0)))
    // bbox-overhang: a triangle whose bbox covers 4 cells but whose
    // geometry puts zero area in one of them — that cell must not appear
    val tri = Seq((3L, "POLYGON ((-175 -85, -165 -85, -165 -75, -175 -85))"))
      .toDF("id", "wkt")
      .withColumn("geometry", st.geomFromText(col("wkt")))
      .withColumn("bbox", st.bboxOf(col("geometry")))
    val triOut = SpatialAggs.zonalStats(tri, cellDeg = 10.0)
      .as[(Long, Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    // bbox covers cells (0,0),(1,0),(0,1),(1,1); the hypotenuse keeps all
    // of the triangle's area out of cell (0,1) (the upper-left cell)
    assert(triOut == Set((0L, 0L), (1L, 0L), (1L, 1L)))
  }

  test("zonalStats partitions total polygon area exactly across cells (random hulls)") {
    // cells tile the plane, so clipping must PARTITION each polygon:
    // sum of per-cell clipped areas == sum of polygon areas
    val rnd = new scala.util.Random(1147)
    val rows = (1 to 40).map { i =>
      val cx = rnd.nextDouble() * 300 - 150
      val cy = rnd.nextDouble() * 140 - 70
      val pts = Array.fill(8)(new org.locationtech.jts.geom.Coordinate(
        cx + rnd.nextDouble() * 20 - 10, cy + rnd.nextDouble() * 16 - 8))
      val hull = GeomCodec.factory.createMultiPointFromCoords(pts).convexHull()
      (i.toLong, GeomCodec.toWkb(hull), hull.getArea)
    }
    val polys = rows.map(r => (r._1, r._2)).toDF("id", "geometry")
      .withColumn("bbox", st.bboxOf(col("geometry")))
    val cellTotal = SpatialAggs.zonalStats(polys, cellDeg = 7.0)
      .agg(sum(col("area"))).head().getDouble(0)
    val polyTotal = rows.map(_._3).sum
    assert(math.abs(cellTotal - polyTotal) < 1e-6 * polyTotal,
      s"clip does not partition: cells=$cellTotal polys=$polyTotal")
  }
}
