package graft

import org.apache.spark.sql.functions._
import graft.functions.st
import graft.plans.GraftOptimizations

/** Declarative SQL spatial joins: `JOIN ON st_intersects(a, b)` must plan
  * as a cell EQUI-join (the grid rewrite), not a cartesian product, and
  * return exactly the naive join's rows.
  */
class StJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def ptsDf = (1 to 300).map { i =>
    (i.toLong, (i % 36) * 10.0 - 175.5, (i % 17) * 10.0 - 80.5)
  }.toDF("pid", "x", "y")
    .withColumn("geometry", st.makePoint(col("x"), col("y")))

  private def boxesDf = (1 to 15).map { b =>
    (b.toLong, s"POLYGON ((${b * 20 - 170} ${b * 8 - 70}, ${b * 20 - 140} ${b * 8 - 70}, " +
      s"${b * 20 - 140} ${b * 8 - 40}, ${b * 20 - 170} ${b * 8 - 40}, ${b * 20 - 170} ${b * 8 - 70}))")
  }.toDF("bid", "wkt")
    .withColumn("geometry", st.geomFromText(col("wkt")))

  test("SQL st_intersects join: grid equi-join plan, naive-join answers") {
    GraftOptimizations.install(spark)
    spark.conf.set("spark.graft.sqlJoin.broadcastBytes", "0")  // pin the grid plan
    ptsDf.createOrReplaceTempView("sj_pts")
    boxesDf.createOrReplaceTempView("sj_boxes")
    val q = spark.sql(
      """SELECT p.pid, b.bid FROM sj_pts p JOIN sj_boxes b
        |ON st_intersects(p.geometry, b.geometry)""".stripMargin)
    val got = q.as[(Long, Long)].collect().toSet
    val plan = q.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"SQL spatial join still plans as a product:\n$plan")
    // ground truth via driver-side JTS over the same inputs
    val ps = ptsDf.select("pid", "x", "y").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val bs = boxesDf.select("bid", "wkt").collect()
      .map(r => (r.getLong(0), graft.geom.GeomCodec.fromWkt(r.getString(1))))
    val want = (for {
      (pid, x, y) <- ps
      (bid, g) <- bs
      if g.intersects(graft.geom.GeomCodec.factory.createPoint(
        new org.locationtech.jts.geom.Coordinate(x, y)))
    } yield (pid, bid)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("reversed argument order transposes the predicate; extra conjuncts survive") {
    GraftOptimizations.install(spark)
    spark.conf.set("spark.graft.sqlJoin.broadcastBytes", "0")  // pin the grid plan
    ptsDf.createOrReplaceTempView("sj_pts")
    boxesDf.createOrReplaceTempView("sj_boxes")
    // st_contains(box, point) with the box on the RIGHT side of the join:
    // the rule must transpose to st_within over (left, right)
    val q = spark.sql(
      """SELECT p.pid, b.bid FROM sj_pts p JOIN sj_boxes b
        |ON st_contains(b.geometry, p.geometry) AND p.pid % 2 = 0""".stripMargin)
    val plan = q.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"transposed spatial join still a product:\n$plan")
    val got = q.as[(Long, Long)].collect().toSet
    assert(got.nonEmpty && got.forall(_._1 % 2 == 0))
    // equi-joins are left alone (Spark already hashes them)
    val equi = spark.sql(
      """SELECT p.pid FROM sj_pts p JOIN sj_boxes b
        |ON p.pid = b.bid AND st_intersects(p.geometry, b.geometry)""".stripMargin)
    assert(equi.count() <= 15)
  }

  // driver-side JTS ground truth over the fixture
  private def truth: (Set[(Long, Long)], Set[Long]) = {
    val ps = ptsDf.select("pid", "x", "y").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val bs = boxesDf.select("bid", "wkt").collect()
      .map(r => (r.getLong(0), graft.geom.GeomCodec.fromWkt(r.getString(1))))
    val pairs = (for {
      (pid, x, y) <- ps
      (bid, g) <- bs
      if g.intersects(graft.geom.GeomCodec.factory.createPoint(
        new org.locationtech.jts.geom.Coordinate(x, y)))
    } yield (pid, bid)).toSet
    (pairs, ps.map(_._1).toSet)
  }

  private def assertNoProduct(q: org.apache.spark.sql.DataFrame): Unit = {
    q.collect()
    val plan = q.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"spatial join still plans as a product:\n$plan")
  }

  test("LEFT OUTER st join: unmatched left rows kept with nulls, grid plan") {
    GraftOptimizations.install(spark)
    spark.conf.set("spark.graft.sqlJoin.broadcastBytes", "0")  // pin the grid plan
    ptsDf.createOrReplaceTempView("sj_pts")
    boxesDf.createOrReplaceTempView("sj_boxes")
    val q = spark.sql(
      """SELECT p.pid, b.bid FROM sj_pts p LEFT JOIN sj_boxes b
        |ON st_intersects(p.geometry, b.geometry)""".stripMargin)
    assertNoProduct(q)
    val got = q.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val (pairs, allPids) = truth
    val matchedPids = pairs.map(_._1)
    val want = pairs.map { case (p, b) => (p, b) } ++
      (allPids -- matchedPids).map(p => (p, -1L))
    assert(got == want)
    assert(got.exists(_._2 == -1L), "fixture should leave some points unmatched")
    assert(got.exists(_._2 != -1L))
  }

  test("LEFT SEMI / LEFT ANTI st joins: membership filters, grid plan, multiplicity kept") {
    GraftOptimizations.install(spark)
    spark.conf.set("spark.graft.sqlJoin.broadcastBytes", "0")  // pin the grid plan
    ptsDf.createOrReplaceTempView("sj_pts")
    boxesDf.createOrReplaceTempView("sj_boxes")
    val (pairs, allPids) = truth
    val matchedPids = pairs.map(_._1)
    val semi = spark.sql(
      """SELECT p.pid FROM sj_pts p LEFT SEMI JOIN sj_boxes b
        |ON st_intersects(p.geometry, b.geometry)""".stripMargin)
    assertNoProduct(semi)
    val semiRows = semi.as[Long].collect().toSeq
    assert(semiRows.toSet == matchedPids)
    assert(semiRows.size == semiRows.toSet.size, "semi join must emit each left row once")
    val anti = spark.sql(
      """SELECT p.pid FROM sj_pts p LEFT ANTI JOIN sj_boxes b
        |ON st_intersects(p.geometry, b.geometry)""".stripMargin)
    assertNoProduct(anti)
    assert(anti.as[Long].collect().toSet == (allPids -- matchedPids))
    // ON-clause extra conjunct participates in MATCHING for left joins:
    // a row failing it still appears (as unmatched) in the outer result
    val outerRest = spark.sql(
      """SELECT p.pid, b.bid FROM sj_pts p LEFT JOIN sj_boxes b
        |ON st_intersects(p.geometry, b.geometry) AND b.bid % 2 = 0
        |WHERE p.pid <= 50""".stripMargin)
    assertNoProduct(outerRest)
    val gotRest = outerRest.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val restPairs = pairs.filter { case (p, b) => p <= 50 && b % 2 == 0 }
    val wantRest = restPairs ++
      (allPids.filter(_ <= 50) -- restPairs.map(_._1)).map(p => (p, -1L))
    assert(gotRest == wantRest)
  }

  test("RIGHT OUTER and FULL OUTER st joins: transposed / unioned dataflow, grid plan") {
    GraftOptimizations.install(spark)
    spark.conf.set("spark.graft.sqlJoin.broadcastBytes", "0")  // pin the grid plan
    ptsDf.createOrReplaceTempView("sj_pts")
    // every fixture box contains points, so add one box in the empty far
    // north: the right/full results must surface it as unmatched
    import spark.implicits._
    boxesDf.unionByName(Seq(
        (99L, "POLYGON ((0 85, 5 85, 5 89, 0 89, 0 85))")).toDF("bid", "wkt")
        .withColumn("geometry", st.geomFromText(col("wkt"))))
      .createOrReplaceTempView("sj_boxes")
    val (pairs, allPids) = truth
    val allBids = (1L to 15L).toSet + 99L
    val matchedBids = pairs.map(_._2)
    val rq = spark.sql(
      """SELECT p.pid, b.bid FROM sj_pts p RIGHT JOIN sj_boxes b
        |ON st_intersects(p.geometry, b.geometry)""".stripMargin)
    assertNoProduct(rq)
    val gotR = rq.collect().map(r =>
      (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1))).toSet
    val wantR = pairs ++ (allBids -- matchedBids).map(b => (-1L, b))
    assert(gotR == wantR)
    val fq = spark.sql(
      """SELECT p.pid, b.bid FROM sj_pts p FULL JOIN sj_boxes b
        |ON st_intersects(p.geometry, b.geometry)""".stripMargin)
    assertNoProduct(fq)
    val gotF = fq.collect().map(r =>
      (if (r.isNullAt(0)) -1L else r.getLong(0),
       if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val wantF = pairs ++
      (allPids -- pairs.map(_._1)).map(p => (p, -1L)) ++
      (allBids -- matchedBids).map(b => (-1L, b))
    assert(gotF == wantF)
    assert(gotF.exists(_._1 == -1L) && gotF.exists(_._2 == -1L),
      "fixture should leave unmatched rows on both sides")
  }

  test("API gridJoinTyped: outer/semi/anti against the inner grid join, with and without id column") {
    val (pairs, allPids) = truth
    val matchedPids = pairs.map(_._1)
    val l = ptsDf.withColumn("bbox", st.bboxOf(col("geometry")))
      .withColumn("id", col("pid").cast("string"))
    val r = boxesDf.withColumn("bbox", st.bboxOf(col("geometry")))
    for (idCol <- Seq(Some("id"), None)) {
      val semi = graft.engine.SpatialJoin.gridJoinTyped(l, r, 30.0, "intersects", "left_semi", idCol)
      assert(semi.select("pid").as[Long].collect().toSet == matchedPids)
      assert(semi.columns.toSeq == l.columns.toSeq, "semi keeps the plain left schema")
      val anti = graft.engine.SpatialJoin.gridJoinTyped(l, r, 30.0, "intersects", "left_anti", idCol)
      assert(anti.select("pid").as[Long].collect().toSet == (allPids -- matchedPids))
      val outer = graft.engine.SpatialJoin.gridJoinTyped(l, r, 30.0, "intersects", "left_outer", idCol)
      val gotOuter = outer.select(col("l_pid"), col("r_bid")).collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
      val want = pairs ++ (allPids -- matchedPids).map(p => (p, -1L))
      assert(gotOuter == want)
    }
  }

  test("ST_DWithin join: dilated-envelope grid plan, exact JTS answers") {
    GraftOptimizations.install(spark)
    spark.conf.set("spark.graft.sqlJoin.broadcastBytes", "0")  // pin the grid plan
    graft.functions.SpatialFunctions.register(spark)
    ptsDf.createOrReplaceTempView("sj_pts")
    boxesDf.createOrReplaceTempView("sj_boxes")
    // radius larger than the 10° cell to prove dilation crosses cell
    // borders; decimal literal arrives as a foldable Cast, not a bare
    // double Literal — the matcher must still recognize it
    val q = spark.sql(
      """SELECT p.pid, b.bid FROM sj_pts p JOIN sj_boxes b
        |ON st_dwithin(p.geometry, b.geometry, 12.5)""".stripMargin)
    val plan = q.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"SQL distance join still plans as a product:\n$plan")
    val got = q.as[(Long, Long)].collect().toSet
    val ps = ptsDf.select("pid", "x", "y").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val bs = boxesDf.select("bid", "wkt").collect()
      .map(r => (r.getLong(0), graft.geom.GeomCodec.fromWkt(r.getString(1))))
    val want = (for {
      (pid, x, y) <- ps
      (bid, g) <- bs
      if g.isWithinDistance(graft.geom.GeomCodec.factory.createPoint(
        new org.locationtech.jts.geom.Coordinate(x, y)), 12.5)
    } yield (pid, bid)).toSet
    assert(got == want)
    // strictly more pairs than the pure intersects join (the dilation ring)
    val inter = spark.sql(
      """SELECT p.pid, b.bid FROM sj_pts p JOIN sj_boxes b
        |ON st_intersects(p.geometry, b.geometry)""".stripMargin)
      .as[(Long, Long)].collect().toSet
    assert(inter.subsetOf(got) && got.size > inter.size)
  }

  test("stats-first pick: tiny probe side broadcasts instead of gridding") {
    GraftOptimizations.install(spark)
    graft.functions.SpatialFunctions.register(spark)
    ptsDf.createOrReplaceTempView("sj_pts")
    boxesDf.createOrReplaceTempView("sj_boxes")
    try {
      spark.conf.set("spark.graft.sqlJoin.broadcastBytes", (256L * 1024L).toString)
      val q = spark.sql(
        """SELECT p.pid, b.bid FROM sj_pts p JOIN sj_boxes b
          |ON st_intersects(p.geometry, b.geometry)""".stripMargin)
      val plan = q.queryExecution.executedPlan.toString()
      // the deliberate broadcast nested loop, with the bbox PRE-computed as
      // a per-row column (so the per-pair condition is pure arithmetic)
      assert(plan.contains("BroadcastNestedLoop") && plan.contains("__g_lb"), plan)
      assert(!plan.contains("CartesianProduct"))
      val (pairs, _) = truth
      assert(q.as[(Long, Long)].collect().toSet == pairs)
      // the dwithin leg rides the same pick, dilated
      val d = spark.sql(
        """SELECT p.pid, b.bid FROM sj_pts p JOIN sj_boxes b
          |ON st_dwithin(p.geometry, b.geometry, 12.5)""".stripMargin)
      assert(d.queryExecution.executedPlan.toString().contains("BroadcastNestedLoop"))
      assert(pairs.subsetOf(d.as[(Long, Long)].collect().toSet))
    } finally spark.conf.set("spark.graft.sqlJoin.broadcastBytes", "0")
  }
}
