package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{SpatialAggs, SpatialJoin}
import graft.functions.st
import graft.pipeline.{Dedup, Similarity}

/** Growth-curve harness: runs the dedup / ANN / spatial-join families on the
  * base corpus and on a synthesized 10× corpus, and records wall-time growth.
  * This is the analog of the reference's bulk-insert size ladder
  * (reference: RTreeBulkInsertTest.java:269-278 runs 10k→562k points with
  * per-size expected counts): sub-quadratic operators must show wall-time
  * growth ≈ linear (≤ ~1.3× linear), and output row counts ~10× — proving
  * the banding / prefix-filter / partition-prune plans hold as data scales.
  *
  * The 10× corpus repeats each source row 10 times UNDER A PER-COPY
  * CONTENT TRANSFORM chosen so copies never match across copies:
  *  - documents: an injective per-copy letter substitution (rotated
  *    alphabet) — token equality structure inside a copy is preserved, so
  *    each copy contributes exactly the original's pair set, while shingles
  *    differ across copies (a naive 10× replication would pair copies with
  *    each other and grow the OUTPUT quadratically, measuring nothing).
  *  - embeddings: a per-copy diagonal ±1 sign flip (orthogonal transform) —
  *    within-copy cosines are bit-identical, cross-copy cosines scatter.
  *  - points: a small per-copy coordinate shift.
  *
  * Usage: runMain graft.tools.BenchScale [sfDir] [outJson]
  */
object BenchScale {

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outJson = args.lift(1).getOrElse("BENCH_scale.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()   // session warm-up

    val scaleDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      "/tmp/graft_scale10x_" + new java.io.File(sfDir).getName)
    val copies = 10

    // ------------------------------------------------ 10× corpus synthesis
    // letters AND digits rotate, so numeric/short documents also differ
    // across copies (identical cross-copy docs would pair with each other
    // and inflate the output superlinearly)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    def rotated(c: Int) =
      alpha.take(26).drop(c * 3 % 26) + alpha.take(c * 3 % 26) +
      alpha.drop(26).drop(c % 10) + alpha.drop(26).take(c % 10)
    val docs1 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val docs10Path = s"$scaleDir/documents10x.parquet"
    if (!new java.io.File(docs10Path).exists()) {
      (0 until copies).map { c =>
        docs1.select((col("doc_id") + lit(c.toLong * 10_000_000L)).as("doc_id"),
          translate(col("text"), alpha, rotated(c)).as("text"))
      }.reduce(_ unionByName _).write.mode("overwrite").parquet(docs10Path)
    }

    val emb1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val emb10Path = s"$scaleDir/embeddings10x.parquet"
    if (!new java.io.File(emb10Path).exists()) {
      val flip = udf((v: Seq[Float], c: Int) =>
        if (c == 0) v.toArray
        else v.indices.map { d =>
          val h = (d * 2654435761L + c * 1099511628211L) >>> 13
          if ((h & 1L) == 1L) -v(d) else v(d)
        }.toArray)
      (0 until copies).map { c =>
        emb1.select((col("vec_id") + lit(c.toLong * 10_000_000L)).as("vec_id"),
          flip(col("embedding"), lit(c)).as("embedding"))
      }.reduce(_ unionByName _).write.mode("overwrite").parquet(emb10Path)
    }

    def pointsOf(cust: DataFrame, shift: Int): DataFrame = cust
      .select((col("c_custkey") + lit(shift.toLong * 10_000_000L)).as("id0"),
        (((col("c_custkey") % 360) - 180 + 0.5).cast("double") + lit(shift * 0.037)).as("x"),
        ((((col("c_custkey") * 7) % 180) - 90 + 0.5).cast("double") * lit(0.995) + lit(shift * 0.00037)).as("y"))
      .withColumn("id", col("id0").cast("string")).drop("id0")
      .withColumn("geometry", st.makePoint(col("x"), col("y")))
      .withColumn("bbox", st.bboxStruct(col("x"), col("y"), col("x"), col("y")))
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    val pts10Path = s"$scaleDir/points10x.parquet"
    val pts1Path = s"$scaleDir/points1x.parquet"
    if (!new java.io.File(pts10Path).exists()) {
      (0 until copies).map(pointsOf(cust, _)).reduce(_ unionByName _)
        .write.mode("overwrite").parquet(pts10Path)
      // copy 0 alone, so both scales read the same storage format
      pointsOf(cust, 0).write.mode("overwrite").parquet(pts1Path)
    }

    // supplier envelope polygons — the fixed dimension side of the join
    val supPolys = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey"),
        ((col("s_suppkey") % 360) - 180 + 0.5).cast("double").as("x"),
        (((col("s_suppkey") * 7) % 180) - 90 + 0.5).cast("double").as("y"))
      .withColumn("geometry", st.makePoint(col("x"), col("y")))
      .groupBy((col("s_suppkey") % 25).as("id"))
      .agg(SpatialAggs.unionAgg(col("geometry")).as("g"))
      .select(col("id"), st.envelope(col("g")).as("geometry"))
      .withColumn("bbox", st.bboxOf(col("geometry")))

    val docs10 = spark.read.parquet(docs10Path)
    val emb10 = spark.read.parquet(emb10Path)
    val pts1 = spark.read.parquet(pts1Path)
    val pts10 = spark.read.parquet(pts10Path)

    // hilbert-clustered copies of both point layers — the stored curve-index
    // read path at both scales (matched rows grow ~10×, the __sfc range
    // prune keeps the scan proportional to MATCHES, not corpus size)
    val curve1Path = s"$scaleDir/curve1x"
    val curve10Path = s"$scaleDir/curve10x"
    if (!new java.io.File(curve10Path).exists()) {
      graft.plans.SpatialLayout.writeClustered(pts1, curve1Path, "hilbert")
      graft.plans.SpatialLayout.writeClustered(pts10, curve10Path, "hilbert")
    }
    def curveWindow(path: String): DataFrame =
      new graft.engine.GeoFrame(spark.read.parquet(path),
          Some(graft.engine.LayerMeta("pts", graft.geom.GeomCodec.GTYPE_POINT,
            encoder = "point-xy", indexType = "hilbert")))
        .windowViaCurve(0.5, -10.5, 30.5, 40.5).df
    val q0 = emb1.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray

    def geo(df: DataFrame) = new graft.engine.GeoFrame(df,
      Some(graft.engine.LayerMeta("pts", graft.geom.GeomCodec.GTYPE_POINT,
        encoder = "point-xy")))

    // --------------------------------------------------------- the families
    def fam(name: String, at1: () => DataFrame, at10: () => DataFrame):
        (String, (Double, Long, Double, Long)) = {
      spark.catalog.clearCache()
      val (warm, _) = time(at1().count())          // warm: codegen + footers
      val (t1, n1) = time(at1().count())
      spark.catalog.clearCache()
      val (t10, n10) = time(at10().count())
      println(f"[scale] $name%-14s t1=$t1%7.2fs ($n1 rows)  t10=$t10%7.2fs ($n10 rows)  " +
        f"growth=${t10 / t1}%5.2fx (warm1 $warm%5.2fs)")
      name -> (t1, n1, t10, n10)
    }

    val results = Seq(
      fam("dd_jaccard",
        () => Dedup.shingleJaccardPairs(docs1, "doc_id", "text", 0.2, 4),
        () => Dedup.shingleJaccardPairs(docs10, "doc_id", "text", 0.2, 4)),
      fam("dd_minhash",
        () => Dedup.minhashNearDupPairs(docs1, "doc_id", "text", 0.2),
        () => Dedup.minhashNearDupPairs(docs10, "doc_id", "text", 0.2)),
      fam("dd_simhash64",
        () => Dedup.simhashNearDupPairs(docs1, "doc_id", "text", 3),
        () => Dedup.simhashNearDupPairs(docs10, "doc_id", "text", 3)),
      fam("sim_ivf_kmeans",
        () => Similarity.ivfTopKKMeans(emb1, "vec_id", "embedding", q0, 20, 16, 2, 3),
        () => Similarity.ivfTopKKMeans(emb10, "vec_id", "embedding", q0, 20, 16, 2, 3)),
      fam("sp_join_grid",
        () => SpatialJoin.gridJoin(pts1, supPolys, 30.0, "intersects"),
        () => SpatialJoin.gridJoin(pts10, supPolys, 30.0, "intersects")),
      fam("sp_window_curve",
        () => curveWindow(curve1Path),
        () => curveWindow(curve10Path)),
      // the reference's signature point-layer queries (SimplePointLayer.java:
      // 61-77): k stays fixed while density grows 10×, so the window-pruned
      // candidate scan must keep wall time well under linear growth
      fam("sp_knn",
        () => geo(pts1).knnCandidates(-100.5, 30.5, 25, initialSide = 60.0)
          .df.orderBy(col("distance")).limit(25),
        () => geo(pts10).knnCandidates(-100.5, 30.5, 25, initialSide = 60.0)
          .df.orderBy(col("distance")).limit(25)),
      // fixed search radius, 10× denser points: matches grow ~10×, wall time
      // must track the match count (window prune + codegen'd distance)
      fam("sp_within_distance",
        () => geo(pts1).withinDistanceKm(10.5, 20.5, 1500.0).df,
        () => geo(pts10).withinDistanceKm(10.5, 20.5, 1500.0).df))

    val json = results.map { case (k, (t1, n1, t10, n10)) =>
      f"""  "$k": {"t1_sec": $t1%.3f, "rows1": $n1, "t10_sec": $t10%.3f, "rows10": $n10, "time_growth": ${t10 / t1}%.2f, "linear_multiple": ${t10 / t1 / copies}%.3f}"""
    }.mkString("{\n" + s"""  "base": "$sfDir", "copies": $copies,\n""", ",\n", "\n}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n")
    println(json)
    spark.stop()
  }
}
