package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.geom.GeomCodec

/** Distributed spatial join: `left JOIN right ON ST_pred(l.geometry, r.geometry)`.
  *
  * The reference only has the degenerate one-query-geometry case (every
  * start*Search factory) plus one true join exercised in tests
  * (reference: server-plugin test TestIntersectsPathQueries.java:65 —
  * point-set vs route geometries). This generalizes both, Spark-first:
  *
  *  - SMALL right side → broadcast hash join on the bbox conjunct, exact
  *    JTS predicate refine. One scan, zero shuffle of the big side.
  *  - BIG both sides → PBSM-style grid join: both sides replicate to the
  *    grid cells their bbox overlaps, equi-shuffle on cell (co-located,
  *    bounded skew via cell sizing), candidate pairs deduplicated by the
  *    reference-point technique (a pair counts only in the cell containing
  *    the top-left corner of the bbox intersection), then bbox + exact
  *    refine. Scales linearly with data per cell — the standard 100 TB
  *    spatial-join shape.
  *
  * Geometry columns are WKB; both sides must carry the canonical `bbox`
  * struct (cheap to derive via st.bboxOf otherwise).
  */
object SpatialJoin {

  private def exactPred(predicate: String): (Column, Column) => Column = {
    val f = udf((a: Array[Byte], b: Array[Byte]) => {
      val ga = GeomCodec.fromWkb(a); val gb = GeomCodec.fromWkb(b)
      predicate match {
        case "intersects" => ga.intersects(gb)
        case "within"     => ga.within(gb)
        case "contains"   => ga.contains(gb)
        case "covers"     => ga.covers(gb)
        case "coveredby"  => ga.coveredBy(gb)
        case "touches"    => ga.touches(gb)
        case "overlaps"   => ga.overlaps(gb)
        case "crosses"    => ga.crosses(gb)
        case other => throw new IllegalArgumentException(s"unknown predicate $other")
      }
    })
    (a, b) => f(a, b)
  }

  private def prefixed(df: DataFrame, prefix: String): DataFrame =
    df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, prefix + c))

  /** Broadcast strategy: right side collected small (dimension-table shape).
    * `joinType` may be any left-preserving type too — with a broadcast
    * right, Spark's nested-loop handles outer/semi/anti natively and the
    * loop is over the small side only. Semi/anti results drop the l_
    * prefix (they are just filtered left rows).
    */
  def broadcastJoin(left: DataFrame, right: DataFrame,
      predicate: String = "intersects", joinType: String = "inner"): DataFrame = {
    val l = prefixed(left, "l_")
    val r = prefixed(right, "r_")
    val out = l.join(broadcast(r),
      col("l_bbox")("minx") <= col("r_bbox")("maxx") &&
      col("l_bbox")("maxx") >= col("r_bbox")("minx") &&
      col("l_bbox")("miny") <= col("r_bbox")("maxy") &&
      col("l_bbox")("maxy") >= col("r_bbox")("miny") &&
      exactPred(predicate)(col("l_geometry"), col("r_geometry")),
      joinType)
    if (joinType == "left_semi" || joinType == "left_anti")
      out.select(left.columns.map(c => col("l_" + c).as(c)).toIndexedSeq: _*)
    else out
  }

  /** Cells (cx, cy) overlapped by a bbox at the given cell size. Callers must
    * pre-filter rows to fan-out ≤ MaxCellsPerRow (see gridJoin); this UDF
    * only ever sees bounded replication.
    */
  private def cellsOf(bboxCol: Column, cellSize: Double): Column = {
    val cells = udf((minx: Double, miny: Double, maxx: Double, maxy: Double) => {
      val x0 = math.floor(minx / cellSize).toLong
      val x1 = math.floor(maxx / cellSize).toLong
      val y0 = math.floor(miny / cellSize).toLong
      val y1 = math.floor(maxy / cellSize).toLong
      val out = for (cx <- x0 to x1; cy <- y0 to y1) yield (cx, cy)
      out.toArray
    })
    cells(bboxCol("minx"), bboxCol("miny"), bboxCol("maxx"), bboxCol("maxy"))
  }

  /** Cap on grid-cell replication per row. A geometry whose bbox spans more
    * cells than this (relative to cellSize — auto-sizing uses the MEAN
    * extent, so a single continent-sized geometry can exceed it arbitrarily)
    * would explode unboundedly and OOM an executor; such rows are few by
    * construction and instead join via broadcast.
    */
  val MaxCellsPerRow = 256L

  private def fanout(bboxCol: Column, cellSize: Double): Column =
    (floor(bboxCol("maxx") / cellSize) - floor(bboxCol("minx") / cellSize) + 1) *
    (floor(bboxCol("maxy") / cellSize) - floor(bboxCol("miny") / cellSize) + 1)

  private def bboxOverlap: Column =
    col("l_bbox")("minx") <= col("r_bbox")("maxx") &&
    col("l_bbox")("maxx") >= col("r_bbox")("minx") &&
    col("l_bbox")("miny") <= col("r_bbox")("maxy") &&
    col("l_bbox")("maxy") >= col("r_bbox")("miny")

  /** PBSM grid strategy for two large sides. `cellSize` should be on the
    * order of the typical right-side bbox extent (a few rows per cell).
    * Rows whose bbox would replicate to more than MaxCellsPerRow cells are
    * split off and joined via broadcast (cheap: they're rare outliers), so
    * per-row explode fan-out is bounded regardless of geometry size.
    */
  def gridJoin(left: DataFrame, right: DataFrame, cellSize: Double,
      predicate: String = "intersects"): DataFrame = {
    val l0 = prefixed(left, "l_")
    val r0 = prefixed(right, "r_")
    val exact = exactPred(predicate)(col("l_geometry"), col("r_geometry"))

    // fan-out computed ONCE per side as a routing column (cheap floor
    // arithmetic, evaluated before cellsOf so an oversized bbox never
    // materializes a giant cell array), then both branches filter on it
    val lF = l0.withColumn("__fo", fanout(col("l_bbox"), cellSize))
    val rF = r0.withColumn("__fo", fanout(col("r_bbox"), cellSize))
    val lNorm = lF.filter(col("__fo") <= MaxCellsPerRow).drop("__fo")
    val lBig  = lF.filter(col("__fo") > MaxCellsPerRow).drop("__fo")
    val rNorm = rF.filter(col("__fo") <= MaxCellsPerRow).drop("__fo")
    val rBig  = rF.filter(col("__fo") > MaxCellsPerRow).drop("__fo")

    val l = lNorm.withColumn("__cell", explode(cellsOf(col("l_bbox"), cellSize)))
    val r = rNorm.withColumn("__cell", explode(cellsOf(col("r_bbox"), cellSize)))

    val grid = l.join(r, l("__cell") === r("__cell"))
      .filter(bboxOverlap)
      // reference-point dedup: emit the pair only from the cell that contains
      // the top-left corner of the bbox intersection (each pair has exactly
      // one such cell, so replicated candidates collapse without a distinct)
      .filter(
        floor(greatest(col("l_bbox")("minx"), col("r_bbox")("minx")) / cellSize) === l("__cell")("_1") &&
        floor(greatest(col("l_bbox")("miny"), col("r_bbox")("miny")) / cellSize) === l("__cell")("_2"))
      .filter(exact)
      .drop("__cell")

    // oversized-left × all-right, and normal-left × oversized-right: covers
    // every pair involving an oversized row exactly once
    val viaBigL = r0.join(broadcast(lBig), bboxOverlap && exact)
    val viaBigR = lNorm.join(broadcast(rBig), bboxOverlap && exact)
    val cols = grid.columns.map(col).toSeq
    grid.unionByName(viaBigL.select(cols: _*)).unionByName(viaBigR.select(cols: _*))
  }

  /** Pick a grid cell size from bbox statistics: a cell should be on the
    * order of the larger of (a) the mean right-side bbox extent — so a
    * typical geometry replicates to O(1) cells — and (b) the data span
    * divided by ~sqrt(4x shuffle parallelism) — so small-extent data still
    * spreads across enough cells to parallelize. One cheap agg over the
    * (already tiny) bbox columns.
    */
  def suggestCellSize(left: DataFrame, right: DataFrame): Double = {
    val s = right.agg(
      avg(col("bbox")("maxx") - col("bbox")("minx")),
      avg(col("bbox")("maxy") - col("bbox")("miny")),
      min(col("bbox")("minx")), max(col("bbox")("maxx")),
      min(col("bbox")("miny")), max(col("bbox")("maxy"))).head()
    if (s.isNullAt(0)) return 1.0   // empty right side: any cell size joins 0 rows
    val meanExtent = math.max(s.getDouble(0), s.getDouble(1))
    val span = math.max(s.getDouble(3) - s.getDouble(2), s.getDouble(5) - s.getDouble(4))
    val parallelism = left.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val bySpan = span / math.max(1.0, math.sqrt(parallelism * 4.0))
    val cell = math.max(meanExtent, bySpan)
    if (cell > 0 && !cell.isNaN && !cell.isInfinite) cell else 1.0
  }

  /** Distributed EXACT k-nearest-neighbor join (grid + ring expansion —
    * the PGBJ shape): for every query point, the `k` nearest points by
    * planar distance, rank ties broken by point id. Both inputs must
    * expose (id, x, y).
    *
    * Exactness argument: phase 1 searches each query's 3×3 cell
    * neighborhood. A query inside its cell is at distance ≥ `margin` (its
    * distance to the 3×3 block boundary) from every point OUTSIDE the
    * block, so when ≥ k candidates exist and the kth candidate distance is
    * ≤ margin, those k are globally exact. Every other query expands to
    * the (2r+1)² cell square with r·cellSize ≥ its kth-candidate upper
    * bound — any globally closer point lies within that bound, and a point
    * within r·cellSize of the query sits at most r cells away, so the
    * square contains every true neighbor. Queries with < k phase-1
    * candidates, or whose ring would exceed MaxCellsPerRow cells, fall
    * back to a cross join — the sparse tail by construction when cellSize
    * is sized so a typical 3×3 block holds ≳ 2k points.
    *
    * Scale shape: one equi-shuffle on cell + one window shuffle on query
    * id in each phase; per-(query, point) candidates appear exactly once
    * (a point lives in exactly one cell), so no dedup pass; the window's
    * per-query top-k never materializes more than a block's candidates.
    */
  def knnJoin(queries: DataFrame, points: DataFrame, k: Int, cellSize: Double,
      excludeSelf: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = cellSize
    val q = queries.select(col("id").as("qid"), col("x").as("qx"), col("y").as("qy"))
      .withColumn("qcx", floor(col("qx") / s))
      .withColumn("qcy", floor(col("qy") / s))
      .withColumn("__margin", least(
        col("qx") - (col("qcx") - 1) * s, (col("qcx") + 2) * s - col("qx"),
        col("qy") - (col("qcy") - 1) * s, (col("qcy") + 2) * s - col("qy")))
    val p = points.select(col("id").as("pid"), col("x").as("px"), col("y").as("py"))
      .withColumn("__cell",
        struct(floor(col("px") / s).as("cx"), floor(col("py") / s).as("cy")))

    val d2 = (col("qx") - col("px")) * (col("qx") - col("px")) +
      (col("qy") - col("py")) * (col("qy") - col("py"))
    val selfF = if (excludeSelf) col("pid") =!= col("qid") else lit(true)
    val w = Window.partitionBy("qid").orderBy(col("d2"), col("pid"))
    val out = Seq("qid", "pid", "d2", "rk").map(col)

    // phase 1: 3×3 neighborhood candidates, per-query top-k + upper bound
    val nbr = explode(array((for (dx <- -1 to 1; dy <- -1 to 1) yield
      struct((col("qcx") + dx).as("cx"), (col("qcy") + dy).as("cy"))): _*))
    val topk1 = q.withColumn("__cell", nbr)
      .join(p, "__cell")
      .filter(selfF)
      .withColumn("d2", d2)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
    val stats = topk1.groupBy(col("qid"))
      .agg(max(col("d2")).as("ub2"), count(lit(1)).as("nc"))
    val statsJ = q.join(stats, Seq("qid"), "left")
    val exactIds = statsJ
      .filter(col("nc") === k && col("ub2") <= col("__margin") * col("__margin"))
      .select("qid")
    val res1 = topk1.join(exactIds, Seq("qid"), "left_semi")

    // phase 2: ring expansion for queries whose bound exceeds the block
    val rest = statsJ.join(exactIds, Seq("qid"), "left_anti")
    val withR = rest.filter(col("nc") === k)
      .withColumn("r", greatest(lit(1L), ceil(sqrt(col("ub2")) / s)))
    val ringable = withR.filter((col("r") * 2 + 1) * (col("r") * 2 + 1) <= MaxCellsPerRow)
    val ringCells = explode(flatten(
      transform(sequence(col("qcx") - col("r"), col("qcx") + col("r")), cx =>
        transform(sequence(col("qcy") - col("r"), col("qcy") + col("r")), cy =>
          struct(cx.as("cx"), cy.as("cy"))))))
    val res2 = ringable.withColumn("__cell", ringCells)
      .join(p, "__cell")
      .filter(selfF)
      .withColumn("d2", d2)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)

    // fallback: < k candidates in the block, or an oversized ring — the
    // sparse tail scans all points
    val fallQ = rest.join(ringable.select("qid"), Seq("qid"), "left_anti")
      .select("qid", "qx", "qy")
    val res3 = fallQ.crossJoin(p.drop("__cell"))
      .filter(selfF)
      .withColumn("d2", d2)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)

    res1.select(out: _*)
      .unionByName(res2.select(out: _*))
      .unionByName(res3.select(out: _*))
  }

  /** Left-preserving spatial joins over the same grid plan: matched pairs
    * come from [[gridJoin]], then the unmatched left rows are recovered /
    * intersected / subtracted via an EQUI-join on a per-row tag (the
    * reference workflow analog: every removeNodes-style flow,
    * SpatialProcedures.java:679-718, is a spatial anti-join).
    *
    *  - `left_semi`: left rows with ≥1 spatial match — plain left schema.
    *  - `left_anti`: left rows with NO spatial match — plain left schema.
    *  - `left_outer`: every matched pair (l_/r_ prefixed, like gridJoin)
    *    plus each unmatched left row once with null r_ columns.
    *
    * `leftIdCol` names a UNIQUE left row id (canonical layers have `id`) —
    * the scale path: nothing materializes. Without one, rows are tagged
    * with `monotonically_increasing_id` and the tagged left is
    * localCheckpoint'ed so both uses (match + recover) see identical tags
    * (a recomputed shuffle can reorder rows, so an unmaterialized tag is
    * not replay-stable).
    */
  def gridJoinTyped(left: DataFrame, right: DataFrame, cellSize: Double,
      predicate: String = "intersects", joinType: String = "left_outer",
      leftIdCol: Option[String] = None): DataFrame = {
    require(Set("left_outer", "left_semi", "left_anti")(joinType),
      s"gridJoinTyped handles left-preserving types, got $joinType (use gridJoin for inner)")
    val tagged = leftIdCol match {
      case Some(c) => left.withColumn("__g_lid", col(c))
      case None => left.withColumn("__g_lid", monotonically_increasing_id())
        .localCheckpoint(true)
    }
    val pairs = gridJoin(tagged, right, cellSize, predicate)
    val matchedIds = pairs.select(col("l___g_lid").as("__g_lid")).distinct()
    joinType match {
      case "left_semi" =>
        tagged.join(matchedIds, Seq("__g_lid"), "left_semi").drop("__g_lid")
      case "left_anti" =>
        tagged.join(matchedIds, Seq("__g_lid"), "left_anti").drop("__g_lid")
      case "left_outer" =>
        val nullRight = right.schema.map(f =>
          lit(null).cast(f.dataType).as("r_" + f.name))
        val unmatched = tagged.join(matchedIds, Seq("__g_lid"), "left_anti")
        val unmatchedShaped = unmatched.select(
          left.columns.map(c => col(c).as("l_" + c)).toIndexedSeq ++
          Seq(col("__g_lid").as("l___g_lid")) ++ nullRight: _*)
        pairs.unionByName(unmatchedShaped).drop("l___g_lid")
    }
  }

  /** Byte thresholds for the stats-based strategy pick. */
  private val BroadcastBytes = BigInt(10L << 20)   // mirror Catalyst's default
  private val DefinitelyBigBytes = BigInt(1L << 30)

  /** Strategy pick, cheapest signal first: Catalyst's size-in-bytes estimate
    * (free — file metadata for scans) decides clearly-small (broadcast) and
    * clearly-large (grid) right sides without touching the data; only the
    * in-between band pays a `count()` scan. Mirrors Catalyst's broadcast
    * sizing decision. `cellSize <= 0` auto-sizes the grid from bbox stats.
    */
  def join(left: DataFrame, right: DataFrame, predicate: String = "intersects",
      cellSize: Double = 0.0, broadcastThreshold: Long = 10000L,
      joinType: String = "inner", leftIdCol: Option[String] = None): DataFrame = {
    val sizeInBytes = right.queryExecution.optimizedPlan.stats.sizeInBytes
    val small = sizeInBytes <= BroadcastBytes ||
      (sizeInBytes < DefinitelyBigBytes && right.count() <= broadcastThreshold)
    if (small) broadcastJoin(left, right, predicate, joinType)
    else {
      val cs = if (cellSize > 0) cellSize else suggestCellSize(left, right)
      if (joinType == "inner") gridJoin(left, right, cs, predicate)
      else gridJoinTyped(left, right, cs, predicate, joinType, leftIdCol)
    }
  }
}
