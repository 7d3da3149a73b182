package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine.{LayerMeta, SpatialCatalog}

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog(): SpatialCatalog =
    new SpatialCatalog(spark, Files.createTempDirectory("graft-cat").toString)

  test("create / list / get / drop point layer") {
    val cat = freshCatalog()
    val src = Seq((1L, 12.0, 56.0), (2L, 13.0, 57.0)).toDF("k", "lon", "lat")
    cat.createPointLayer("pts", src, "k", "lon", "lat")
    assert(cat.listLayers() == Seq("pts"))
    val layer = cat.getLayer("pts")
    assert(layer.count() == 2)
    assert(layer.meta.exists(_.encoder == "point-xy"))
    assert(layer.df.columns.toSet == Set("id", "geometry", "gtype", "bbox", "x", "y"))
    cat.dropLayer("pts")
    assert(cat.listLayers().isEmpty)
  }

  test("WKT layer discovers gtype per row") {
    val cat = freshCatalog()
    val src = Seq(("a", "POINT (1 2)"), ("b", "LINESTRING (0 0, 1 1)")).toDF("k", "wkt")
    val layer = cat.createWktLayer("wl", src, "k", "wkt")
    val types = layer.df.select("id", "gtype").as[(String, Int)].collect().toMap
    assert(types == Map("a" -> 1, "b" -> 2))
  }

  test("append and remove mirror addNodes/removeNodes count semantics") {
    val cat = freshCatalog()
    val src = Seq((1L, 12.0, 56.0)).toDF("k", "lon", "lat")
    cat.createPointLayer("pts", src, "k", "lon", "lat")
    val more = cat.getLayer("pts").df.withColumn("id", lit("2"))
    cat.appendToLayer("pts", more)
    assert(cat.getLayer("pts").count() == 2)
    // removal count = before - after (reference: SpatialProcedures.java:697-703)
    val removed = cat.removeFromLayer("pts", Seq("2", "does-not-exist"))
    assert(removed == 1)
    assert(cat.getLayer("pts").count() == 1)
  }

  test("dynamic layer = filtered temp view with pushdown") {
    val cat = freshCatalog()
    val src = Seq((1L, 12.0, 56.0), (2L, 13.0, 57.0), (3L, 14.0, 58.0)).toDF("k", "lon", "lat")
    val layer = cat.createPointLayer("pts3", src, "k", "lon", "lat")
    val dyn = layer.asDynamicLayer("north_pts", "y >= 57.0")
    assert(dyn.count() == 2)
    assert(spark.sql("SELECT count(*) FROM north_pts").as[Long].head() == 2)
  }
}
