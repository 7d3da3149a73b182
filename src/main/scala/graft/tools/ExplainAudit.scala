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

    println("========== funnel: one exchange on user_id ==========")
    val ev = spark.range(10000).select((col("id") % 100).as("user_id"),
      col("id").as("event_id"), (col("id") * 131 % 100000).as("tsn"),
      element_at(array(lit("view"), lit("click"), lit("purchase")),
        (col("id") % 3 + 1).cast("int")).as("event_type"))
    graft.pipeline.Events.funnel(ev, Seq("view", "click", "purchase"), 50000)
      .explain("formatted")

    println("========== CMS estimate: sketch must broadcast ==========")
    val sk = graft.pipeline.CountMin.sketch(ev, "user_id")
    graft.pipeline.CountMin.estimate(ev.select("user_id").distinct(), "user_id", sk)
      .explain("formatted")

    println("========== triangles: wedge join shapes ==========")
    val edges = spark.range(20000).select((col("id") % 600).as("src"),
      (col("id") * 7919 % 600).as("dst"))
    graft.pipeline.Graphs.triangleCounts(edges).explain("formatted")

    println("========== tfidf: vocab-keyed df join + per-doc window ==========")
    val docs = spark.range(5000).select(col("id").as("doc_id"),
      concat_ws(" ", array((0 until 20).map(i =>
        concat(lit("w"), ((col("id") + i) % 500).cast("string"))): _*)).as("text"))
    graft.pipeline.Corpus.tfidfTopTerms(docs, "doc_id", "text", 3)
      .explain("formatted")

    println("========== tile pyramid: coarse levels reuse finer AGGREGATE ==========")
    val tilePts = pts.select(col("id"), col("x"), col("y"),
      (col("id") % 1000).cast("double").as("c_acctbal"))
    val fine = tilePts.groupBy(
        floor((col("x") + 180.0) / 5.0).cast("long").as("cell_x"),
        floor((col("y") + 90.0) / 5.0).cast("long").as("cell_y"))
      .agg(count(lit(1)).as("n"), sum(col("c_acctbal").cast("decimal(18,2)")).as("s"))
    fine.groupBy(expr("cell_x div 3").as("cell_x"), expr("cell_y div 3").as("cell_y"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
      .explain("formatted")

    println("========== ANN kNN join: list-keyed probe join + window top-k ==========")
    val vecs = spark.range(2000).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => (((col("id") * 31 + i * 7) % 97) / lit(97.0)).cast("float")).as("embedding"))
    graft.pipeline.Similarity.ivfKnnJoin(vecs,
        vecs.filter(col("vec_id") % 25 === 0), "vec_id", "embedding", 5, 8, 2)
      .explain("formatted")

    println("========== bucketed co-located join: zero Exchange on inputs ==========")
    val bdir = java.nio.file.Files.createTempDirectory("audit-bucketed").toString
    val left = spark.range(20000).select(col("id").as("k"), (col("id") % 7).as("v"))
    val right = spark.range(5000).select((col("id") * 4).as("k2"), (col("id") % 3).as("g"))
    graft.plans.Bucketing.writeBucketed(left, "audit_l", s"$bdir/l", 4, "k")
    graft.plans.Bucketing.writeBucketed(right, "audit_r", s"$bdir/r", 4, "k2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.table("audit_l").join(spark.table("audit_r"), col("k") === col("k2"))
      .explain("formatted")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    println("========== column profile: ONE (column, value) exchange, no expand ==========")
    graft.pipeline.Profiling.columnProfile(left.toDF("k", "v"), Seq("k", "v"))
      .explain("formatted")

    println("========== zonal stats: cell fan-out in the scan projection ==========")
    val polys = spark.range(50).select(col("id"),
        graft.functions.st.geomFromText(concat(lit("POLYGON (("),
          col("id") * 3 - 39.5, lit(" "), col("id") * 2 - 29.5, lit(", "),
          col("id") * 3 - 34.5, lit(" "), col("id") * 2 - 29.5, lit(", "),
          col("id") * 3 - 34.5, lit(" "), col("id") * 2 - 25.5, lit(", "),
          col("id") * 3 - 39.5, lit(" "), col("id") * 2 - 25.5, lit(", "),
          col("id") * 3 - 39.5, lit(" "), col("id") * 2 - 29.5, lit("))")))
          .as("geometry"))
      .withColumn("bbox", graft.functions.st.bboxOf(col("geometry")))
    graft.engine.SpatialAggs.zonalStats(polys, 3.0).explain("formatted")

    println("========== shard assign: ONE shard exchange + in-shard sort ==========")
    val shardDocs = spark.range(5000).select(col("id").as("doc_id"),
      lit("a b c d").as("text"))
    graft.pipeline.Packing.shardAssign(shardDocs, "doc_id", "text", 16, "s:")
      .explain("formatted")

    println("========== interval join: cell equi-join, no product ==========")
    val ijL = spark.range(2000).select(col("id").as("l_id"),
      (col("id") * 977 % 100000).as("l_ts"))
    val ijR = spark.range(3000).select((col("id") * 643 % 100000).as("r_ts"),
      col("id").as("r_id"))
    graft.pipeline.Events.intervalJoin(ijL, ijR, "l_ts", "r_ts", 500L)
      .explain("formatted")

    println("========== SQL ST_DWithin: grid rewrite (pinned), dilated probe ==========")
    spark.conf.set("spark.graft.sqlJoin.broadcastBytes", "0")
    pts.withColumn("geometry",
        graft.functions.st.makePoint(col("x"), col("y")))
      .createOrReplaceTempView("audit_pts")
    pts.limit(50).withColumn("geometry",
        graft.functions.st.makePoint(col("x"), col("y")))
      .createOrReplaceTempView("audit_dims")
    spark.sql(
      """SELECT a.id, b.id FROM audit_pts a JOIN audit_dims b
        |ON st_dwithin(a.geometry, b.geometry, CAST(2.5 AS DOUBLE))""".stripMargin)
      .explain("formatted")

    println("========== shapefile DSv2: pruned readSchema + shx slices ==========")
    val shpDir = java.nio.file.Files.createTempDirectory("graft-explain-shp")
    val shpRows = spark.range(1, 101).select(col("id"),
        graft.functions.st.makePoint(lit(1.0) * col("id") % 90,
          lit(0.5) * col("id") % 45).as("geometry"))
      .withColumn("props", map(lit("name"), concat(lit("r"), col("id"))))
    graft.sources.Shapefile.exportShapefile(shpRows, shpDir.resolve("pts").toString)
    spark.read.format("shapefile").option("maxRecordsPerPartition", "25")
      .load(shpDir.resolve("pts").toString + ".shp")
      .filter(col("rec_no") <= 25).select("name")
      .explain("formatted")

    println("========== hexbin: one integer-key exchange, codegen binning ==========")
    pts.select(graft.functions.HexBin.cell(col("x"), col("y"), 5.0).as("h"),
        (col("id") % 1000).cast("double").as("v"))
      .groupBy(col("h.q").as("q"), col("h.r").as("r"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .explain("formatted")

    println("========== kcore round: degree agg partial-combines, survivor joins keyed ==========")
    graft.pipeline.Graphs.kcorePeel(edges, k = 3, rounds = 2)
      .explain("formatted")

    println("========== SQ8: stats once, quantized scan + TakeOrderedAndProject ==========")
    val emb = spark.range(2000).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => ((col("id") + i) % 97).cast("float") / 97.0f).as("embedding"))
    graft.pipeline.Similarity.sq8TopK(emb, "vec_id", "embedding",
        Array.fill(16)(0.5), shortlist = 50, k = 10)
      .explain("formatted")

    spark.stop()
  }
}
