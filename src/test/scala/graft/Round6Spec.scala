package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.pipeline.Events

/** Round-6 contracts: the three per-user rollup rank operators must carry
  * NO WindowExec (the round-5 verdict's one scale-killer shape — an
  * unpartitioned row_number/ntile sorts the whole user table on a single
  * partition), and the closed-form ntile recovery must agree with SQL
  * ntile bucket-for-bucket on ragged sizes.
  */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  private def evDf = (1L to 500L).map(i =>
      (i % 97, i, i * 1000L, if (i % 3 == 0) "purchase" else "view",
        (i % 13).toDouble))
    .toDF("user_id", "event_id", "tsn", "event_type", "value")

  test("gini/rfm/pareto plans have NO WindowExec (distributed rank contract)") {
    for ((nm, df) <- Seq(
        "gini" -> Events.giniRevenue(evDf),
        "rfm" -> Events.rfmSegments(evDf),
        "pareto" -> Events.paretoDeciles(evDf))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$nm plan still has a window:\n$plan")
    }
  }

  test("ntileFromRank matches SQL ntile for ragged bucket sizes") {
    for (n <- Seq(1, 2, 9, 10, 11, 47); q <- Seq(1, 2, 3, 5, 10)) {
      val df = (1 to n).map(_.toLong).toDF("i")
      val viaRank = df
        .select(col("i"), Events.ntileFromRank(col("i"), lit(n.toLong), q).as("b"))
        .orderBy("i").as[(Long, Long)].collect().map(_._2).toSeq
      val viaNtile = df
        .select(col("i"), ntile(q).over(Window.orderBy("i")).cast("long").as("b"))
        .orderBy("i").as[(Long, Long)].collect().map(_._2).toSeq
      assert(viaRank == viaNtile, s"n=$n q=$q: $viaRank vs $viaNtile")
    }
  }

  test("globalRank is dense, 1-based, and respects desc order with tiebreak") {
    val df = Seq((5L, "a"), (5L, "b"), (3L, "c"), (9L, "d")).toDF("v", "k")
    val r = Events.globalRank(df, Seq(col("v").desc, col("k").asc), "i")
      .orderBy("i").select(col("k"), col("i")).as[(String, Long)].collect().toSeq
    assert(r == Seq(("d", 1L), ("a", 2L), ("b", 3L), ("c", 4L)))
  }

  test("q9 join order: dimensions broadcast, only the orders join shuffles") {
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q9_profit")(spark, dir)
      .queryExecution.executedPlan.toString
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 2, s"expected >=2 broadcast joins (part, supplier×nation):\n$plan")
    // the lineitem×orders fact-fact join must NOT broadcast a fact side —
    // with 3 joins total, at most one non-broadcast join remains
    val nJoins = "Join".r.findAllIn(plan).length
    assert(nJoins >= 3, s"expected the full 3-join star:\n$plan")
  }

  test("q20 keeps both LeftSemi operators in the physical plan") {
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q20_excess_stock")(spark, dir)
      .queryExecution.executedPlan.toString
    val nSemi = "LeftSemi".r.findAllIn(plan).length
    assert(nSemi >= 2, s"expected the nested semi-join chain (2 LeftSemi):\n$plan")
  }

  test("DynamicLayerJson: the reference's doc example admits residential ways only") {
    // the Javadoc example from DynamicIndexReader.java:50-57 (with the
    // JSON commas its prose rendering elides): geometry-node property test,
    // then the GEOM/TAGS two-step traversal to the highway tag
    val json =
      """{ "properties": {"type": "geometry"},
        |  "step": {"type": "GEOM", "direction": "INCOMING",
        |    "step": {"type": "TAGS", "direction": "OUTGOING",
        |      "properties": {"highway": "residential"}
        |    }
        |  }
        |}""".stripMargin
    val rows = Seq(
      (1L, Map("type" -> "geometry"), Map("highway" -> "residential")),
      (2L, Map("type" -> "geometry"), Map("highway" -> "primary")),
      (3L, Map("type" -> "geometry"), Map.empty[String, String]),
      (4L, Map("other" -> "x"), Map("highway" -> "residential")))
      .toDF("way_id", "geom_props", "tag_props")
      // flattened layer row: geometry-node props + way tags in one map
      .select(col("way_id"),
        map_concat(col("geom_props"), col("tag_props")).as("props"))
    val got = rows.filter(
        graft.functions.DynamicLayerJson.toColumn(json, rows.columns.toSet))
      .select("way_id").as[Long].collect().toSeq.sorted
    assert(got == Seq(1L))
  }

  test("DynamicLayerJson: match semantics follow queryNodeProperties exactly") {
    val rows = Seq(
      (1L, Map("oneway" -> "yes")), (2L, Map("oneway" -> "1")),
      (3L, Map("oneway" -> "TRUE")), (4L, Map.empty[String, String]))
      .toDF("id", "props")
    val top = rows.columns.toSet
    // exact string compare: '1'/'TRUE' do NOT match 'yes'
    val eq = rows.filter(graft.functions.DynamicLayerJson.toColumn(
      """{"properties": {"oneway": "yes"}}""", top))
    assert(eq.select("id").as[Long].collect().toSeq == Seq(1L))
    // null match value = existence test
    val ex = rows.filter(graft.functions.DynamicLayerJson.toColumn(
      """{"properties": {"oneway": null}}""", top))
    assert(ex.select("id").as[Long].collect().toSeq.sorted == Seq(1L, 2L, 3L))
    // numeric literal matches via string conversion (the Long!=Integer rule)
    val num = Seq((1L, Map("lanes" -> "2")), (2L, Map("lanes" -> "3")))
      .toDF("id", "props")
    val m = num.filter(graft.functions.DynamicLayerJson.toColumn(
      """{"properties": {"lanes": 2}}""", num.columns.toSet))
    assert(m.select("id").as[Long].collect().toSeq == Seq(1L))
    // malformed queries throw: unknown direction, missing step type
    intercept[IllegalArgumentException](graft.functions.DynamicLayerJson.toColumn(
      """{"step": {"type": "GEOM", "direction": "SIDEWAYS"}}""", top))
    intercept[IllegalArgumentException](graft.functions.DynamicLayerJson.toColumn(
      """{"step": {"direction": "INCOMING"}}""", top))
  }

  test("sccLabels: cycles, a DAG bridge, a tail and an isolated node — multi-round peel") {
    // SCCs: {1,2,3} (3-cycle), {5,6} (2-cycle, downstream of the first so
    // it peels in a LATER round — its min-ancestor color is 1), {8} (tail),
    // {9} (isolated)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (5L, 6L), (6L, 5L),
      (3L, 5L), (6L, 8L)).toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L, 5L, 6L, 8L, 9L).toDF("id")
    val got = graft.pipeline.Graphs.sccLabels(verts, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L, 8L -> 8L, 9L -> 9L))
  }

  test("globalRank agrees with row_number across many partitions") {
    val df = spark.range(0, 1000, 1, 16)
      .select((col("id") * 7919 % 101).as("v"), col("id").as("k"))
    val viaRank = Events.globalRank(df, Seq(col("v").asc, col("k").asc), "i")
      .select("k", "i").as[(Long, Long)].collect().toMap
    val viaWindow = df.select(col("k"),
        row_number().over(Window.orderBy(col("v").asc, col("k").asc))
          .cast("long").as("i"))
      .as[(Long, Long)].collect().toMap
    assert(viaRank == viaWindow)
  }
}
