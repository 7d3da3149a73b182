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
}
