package graft

import org.apache.spark.sql.functions._

import graft.functions.st
import graft.sources.{Shapefile, ShapefileV2}

/** DataSource V2 shapefile connector: shx-sliced parallel scan equals the
  * V1 driver-side import; column pruning reaches the reader.
  */
class ShapefileV2Spec extends SparkSpec {
  import spark.implicits._

  private lazy val base: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-shpv2")
    dir.toFile.deleteOnExit()
    val rows = (1 to 25).map { i =>
      (i.toLong, s"LINESTRING (${i} 0, ${i} ${i % 7 + 1}, ${i + 1} ${i % 7 + 1})", s"name-$i")
    }.toDF("id", "wkt", "nm")
      .withColumn("geometry", st.geomFromText(col("wkt")))
      .withColumn("props", map(lit("name"), col("nm")))
      .select("id", "geometry", "props")
    val b = dir.resolve("lines").toString
    Shapefile.exportShapefile(rows, b)
    b
  }

  test("v2 scan equals the v1 import, sliced into multiple partitions") {
    val v2 = spark.read.format("shapefile")
      .option("maxRecordsPerPartition", "7")
      .load(base + ".shp")
    // 25 records at 7/partition → 4 input partitions, planned from .shx
    assert(ShapefileV2.partitionsOf(base + ".shp", 7).length == 4)
    assert(v2.rdd.getNumPartitions == 4)
    val got = v2.select(col("rec_no"), col("geometry"), col("name"))
      .collect().map(r => (r.getInt(0), st2wkt(r.getAs[Array[Byte]](1)), r.getString(2)))
      .sortBy(_._1)
    val v1 = Shapefile.importShapefile(spark, base + ".shp").df
      .select(col("id").cast("int"), col("geometry"), col("props").getItem("name"))
      .collect().map(r => (r.getInt(0), st2wkt(r.getAs[Array[Byte]](1)), r.getString(2)))
      .sortBy(_._1)
    assert(got.length == 25)
    assert(got.toSeq == v1.toSeq)
  }

  private def st2wkt(wkb: Array[Byte]): String =
    graft.geom.GeomCodec.toWkt(graft.geom.GeomCodec.fromWkb(wkb))

  test("column pruning reaches the reader (attribute-only ReadSchema)") {
    val v2 = spark.read.format("shapefile").load(base + ".shp")
    val q = v2.select("name")
    val read = q.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.readSchema()
    }
    assert(read.exists(_.fieldNames.toSeq == Seq("name")),
      s"geometry not pruned from the scan: readSchema=$read")
    assert(q.as[String].collect().sorted.head == "name-1")
    // and a count() scan needs neither geometry nor dbf
    assert(v2.count() == 25)
  }

  test("rec_no filters prune .shx slices at planning time") {
    val v2 = spark.read.format("shapefile")
      .option("maxRecordsPerPartition", "7")
      .load(base + ".shp")
    // 25 recs in 4 slices of 7; rec_no <= 7 touches only slice 1
    val q = v2.filter(col("rec_no") <= 7).select("rec_no", "name")
    val parts = q.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.partitions.length
    }
    assert(parts.contains(1), s"expected 1 planned slice, got $parts")
    assert(q.select("rec_no").as[Int].collect().sorted.toSeq == (1 to 7))
    // a middle slice: 8..14 → exactly one slice again, rows re-filtered
    val mid = v2.filter(col("rec_no") >= 9 && col("rec_no") < 12)
    val midParts = mid.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.partitions.length
    }
    assert(midParts.contains(1))
    assert(mid.select("rec_no").as[Int].collect().sorted.toSeq == Seq(9, 10, 11))
  }

  test("directory of shapefiles scans as one table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shpv2-multi")
    dir.toFile.deleteOnExit()
    for (part <- Seq("a", "b")) {
      val rows = (1 to 4).map { i =>
        (i.toLong, s"POINT (${i} ${i})", s"$part-$i")
      }.toDF("id", "wkt", "nm")
        .withColumn("geometry", st.geomFromText(col("wkt")))
        .withColumn("props", map(lit("name"), col("nm")))
        .select("id", "geometry", "props")
      Shapefile.exportShapefile(rows, dir.resolve(part).toString)
    }
    val v2 = spark.read.format("shapefile").load(dir.toString)
    assert(v2.count() == 8)
    assert(v2.select("name").as[String].collect().toSet ==
      (1 to 4).flatMap(i => Seq(s"a-$i", s"b-$i")).toSet)
  }
}
