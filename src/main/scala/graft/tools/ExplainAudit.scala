package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the physical plans of the hot query shapes so scan pruning and
  * codegen spans can be audited (run after any planner-affecting change).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wh = java.nio.file.Files.createTempDirectory("graft-explain").toString
    val cat = new graft.engine.SpatialCatalog(spark, wh)
    val pts = spark.range(100000)
      .withColumn("x", (col("id") * 37 % 3600).cast("double") / 10 - 180)
      .withColumn("y", (col("id") * 73 % 1800).cast("double") / 10 - 90)
    cat.createPointLayer("audit", pts, "id", "x", "y", indexType = "hilbert")
    val layer = cat.getLayer("audit")

    println("========== window query over stored hilbert layer ==========")
    layer.intersectsWindow(-10, -10, 10, 10).df.explain("formatted")

    println("========== windowViaCurve: __sfc range scan ==========")
    layer.windowViaCurve(-10, -10, 10, 10).df.explain("formatted")

    println("========== withinDistance over stored layer ==========")
    layer.withinDistanceKm(0, 0, 500).df.explain("formatted")

    println("========== two-column projection (pruning check) ==========")
    layer.df.select("id", "x").filter(col("x") > 100).explain("formatted")

    println("========== BboxConjunctRule: auto-injected envelope pre-filter ==========")
    graft.plans.GraftOptimizations.install(spark)
    graft.functions.SpatialFunctions.register(spark)
    val rect = graft.geom.GeomCodec.toWkb(graft.geom.GeomCodec.fromWkt(
      "POLYGON ((-10 -10, 10 -10, 10 10, -10 10, -10 -10))"))
    layer.df.filter(call_udf("st_intersects", col("geometry"), lit(rect)))
      .explain("formatted")

    spark.stop()
  }
}
