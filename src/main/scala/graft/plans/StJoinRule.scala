package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._

/** Declarative SQL spatial joins, made scalable: Spark plans
  * `FROM a JOIN b ON st_intersects(a.geom, b.geom)` as a CARTESIAN product
  * (BroadcastNestedLoop at best) because the condition has no equi-join
  * key. This optimizer rule recognizes an inner join whose condition
  * carries a cross-side `st_*` predicate and NO equi-conjunct, and
  * rewrites it into the PBSM grid join: both sides explode to the grid
  * cells their envelopes cover, the join becomes an EQUI-join on the cell,
  * reference-point dedup collapses replicated candidates without a
  * distinct, and the exact JTS predicate decides membership — the same
  * plan [[graft.engine.SpatialJoin.gridJoin]] builds through the API, but
  * reached from plain SQL. O(cells + candidate pairs) instead of O(|a|·|b|).
  *
  * Scope (documented, not silently wrong): INNER joins; the ST conjunct's
  * arguments must be bare geometry columns, one from each side; remaining
  * conjuncts are re-applied as a post-join filter. Joins that already have
  * an equi-key are left alone (Spark hashes those fine). Cell size comes
  * from `spark.graft.sqlJoin.cellSize` (degrees, default 10.0) — at 100 TB
  * set it from bbox stats exactly like the API path's suggestCellSize.
  */
object StJoinRule extends Rule[LogicalPlan] {

  /** predicate → its transpose when the arguments arrive (right, left) */
  private val Transpose = Map(
    "st_intersects" -> "st_intersects", "st_touches" -> "st_touches",
    "st_overlaps" -> "st_overlaps",
    "st_within" -> "st_contains", "st_contains" -> "st_within",
    "st_covers" -> "st_coveredby", "st_coveredby" -> "st_covers")

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case o => Seq(o)
  }

  private def crossEqui(e: Expression, l: LogicalPlan, r: LogicalPlan): Boolean =
    e match {
      case EqualTo(a, b) =>
        (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
        (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      val cs = conjuncts(cond)
      val stMatch = cs.zipWithIndex.collectFirst {
        case (u: ScalaUDF, i) if u.udfName.exists(Transpose.contains) &&
            u.children.forall(_.isInstanceOf[AttributeReference]) &&
            u.children.size == 2 =>
          val Seq(a: AttributeReference, b: AttributeReference) = u.children
          if (left.outputSet.contains(a) && right.outputSet.contains(b))
            Some((i, u.udfName.get, a, b))
          else if (left.outputSet.contains(b) && right.outputSet.contains(a))
            Some((i, Transpose(u.udfName.get), b, a))
          else None
      }.flatten
      stMatch match {
        case Some((i, pred, lGeom, rGeom)) if !cs.exists(crossEqui(_, left, right)) =>
          rewrite(j, left, right, cs.patch(i, Nil, 1), pred, lGeom, rGeom)
        case _ => j
      }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      rest: Seq[Expression], pred: String,
      lGeom: AttributeReference, rGeom: AttributeReference): LogicalPlan = {
    val spark = SparkSession.active
    val cell = spark.conf.getOption("spark.graft.sqlJoin.cellSize")
      .map(_.toDouble).getOrElse(10.0)
    val lDf = GraftColumnBridge.ofRows(spark, left)
    val rDf = GraftColumnBridge.ofRows(spark, right)
    val lg = GraftColumnBridge.column(lGeom)
    val rg = GraftColumnBridge.column(rGeom)
    def cellsX(b: org.apache.spark.sql.Column) = explode(sequence(
      floor(b("minx") / cell).cast("long"), floor(b("maxx") / cell).cast("long")))
    def cellsY(b: org.apache.spark.sql.Column) = explode(sequence(
      floor(b("miny") / cell).cast("long"), floor(b("maxy") / cell).cast("long")))
    val lb = lDf.withColumn("__g_lb", graft.functions.st.bboxOf(lg))
      .withColumn("__g_lcx", cellsX(col("__g_lb")))
      .withColumn("__g_lcy", cellsY(col("__g_lb")))
    val rb = rDf.withColumn("__g_rb", graft.functions.st.bboxOf(rg))
      .withColumn("__g_rcx", cellsX(col("__g_rb")))
      .withColumn("__g_rcy", cellsY(col("__g_rb")))
    val glb = col("__g_lb"); val grb = col("__g_rb")
    val overlap =
      glb("minx") <= grb("maxx") && grb("minx") <= glb("maxx") &&
      glb("miny") <= grb("maxy") && grb("miny") <= glb("maxy")
    // reference-point dedup: only the cell holding the intersection's
    // min corner emits the pair
    val refPoint =
      floor(greatest(glb("minx"), grb("minx")) / cell).cast("long") === col("__g_lcx") &&
      floor(greatest(glb("miny"), grb("miny")) / cell).cast("long") === col("__g_lcy")
    val joined = lb.join(rb,
        col("__g_lcx") === col("__g_rcx") && col("__g_lcy") === col("__g_rcy") &&
        overlap && refPoint && call_udf(pred, lg, rg))
      .select((j.output).map(a => GraftColumnBridge.column(a)): _*)
    val withRest =
      if (rest.isEmpty) joined
      else joined.filter(GraftColumnBridge.column(rest.reduce(And)))
    val newPlan = withRest.queryExecution.analyzed
    // output attributes are pass-through (no aliasing), so ExprIds already
    // line up; a defensive projection restores them if an analyzer step
    // re-aliased anything
    if (newPlan.output.map(_.exprId) == j.output.map(_.exprId)) newPlan
    else Project(j.output.zip(newPlan.output).map { case (o, n) =>
      Alias(n, o.name)(exprId = o.exprId)
    }, newPlan)
  }
}
