package graft

import org.apache.spark.sql.functions._

import graft.engine.GeoFrame
import graft.functions.st
import graft.geom.Orthodromic

/** Round-4 fixes: k-NN exactness across the antimeridian and the analytic
  * outside-window distance bound.
  */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  test("minDistanceOutsideWindowKm lower-bounds every outside point (analytic, wrapped Δλ)") {
    val rnd = new scala.util.Random(4042)
    for (_ <- 1 to 2000) {
      val lon = rnd.nextDouble() * 360 - 180
      val lat = rnd.nextDouble() * 170 - 85
      val half = 0.01 + rnd.nextDouble() * 40
      val bound = Orthodromic.minDistanceOutsideWindowKm(lon, lat, half)
      // sample a point OUTSIDE the window in wrapped-Δλ/Δlat terms
      val dLat = (half + rnd.nextDouble() * 60) * (if (rnd.nextBoolean()) 1 else -1)
      val dLon = (half + rnd.nextDouble() * (360 - 2 * half)) * (if (rnd.nextBoolean()) 1 else -1)
      val latOut = math.max(-90, math.min(90, lat + dLat))
      var lonOut = lon + dLon
      if (lonOut > 180) lonOut -= 360
      if (lonOut < -180) lonOut += 360
      val viaLat = Orthodromic.distanceKm(lon, lat, lon, latOut)   // |Δlat| ≥ half arm
      val latIn = math.max(-90, math.min(90, lat + (rnd.nextDouble() * 2 - 1) * half))
      val viaLon = Orthodromic.distanceKm(lon, lat, lonOut, latIn)
      assert(viaLat >= bound, s"lat arm violated: d=$viaLat bound=$bound at ($lon,$lat) half=$half")
      assert(viaLon >= bound, s"lon arm violated: d=$viaLon bound=$bound at ($lon,$lat) half=$half")
    }
  }

  test("knnCandidates is exact across the antimeridian") {
    // cluster on BOTH sides of ±180: the true nearest neighbors of a query
    // at lon 179.8 include points at lon -179.9 (wrapped Δλ = 0.3°), which a
    // raw-longitude window prune would exclude
    val pts = (0 until 40).map { i =>
      val lon = if (i % 2 == 0) 179.0 + (i % 10) * 0.1 else -179.9 + (i % 10) * 0.1
      (i.toLong, lon, 10.0 + (i / 10) * 0.05)
    } ++ (0 until 200).map { i =>          // far-away decoys pull the density
      (1000L + i, -30.0 + i * 0.3, 10.0 + (i % 7) * 0.4)   // estimate DOWN so
    }                                       // the first window is small
    val df = pts.toDF("k", "x", "y")
      .withColumn("id", col("k").cast("string"))
      .withColumn("geometry", st.makePoint(col("x"), col("y")))
      .withColumn("bbox", st.bboxStruct(col("x"), col("y"), col("x"), col("y")))
    val layer = new GeoFrame(df)
    val k = 10
    val viaPruned = layer.knnCandidates(179.8, 10.0, k)
      .df.orderBy(col("distance"), col("id")).limit(k)
      .select("id").as[String].collect().toSeq
    val full = df
      .withColumn("distance", st.orthodromicKm(lit(179.8), lit(10.0), col("x"), col("y")))
      .orderBy(col("distance"), col("id")).limit(k)
      .select("id").as[String].collect().toSeq
    assert(viaPruned == full, s"pruned k-NN $viaPruned != full-scan k-NN $full")
    // sanity: the true top-k really does span the antimeridian
    val wrapped = full.count(id => pts.exists(p => p._1.toString == id && p._2 < 0))
    assert(wrapped > 0, "fixture broken: no wrapped neighbor in the true top-k")
  }
}
