package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.sql.GraftColumnBridge

import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}

import graft.geom.GeomCodec

/** Spatial predicate against a CONSTANT query geometry, as a native Catalyst
  * expression that caches the deserialized + JTS-prepared query geometry per
  * task — the same trick the reference gets by constructing its filter object
  * once per query (reference: server-plugin/.../filter/SearchIntersectWindow.java:44-55,
  * SearchIntersect.java:28-40). A plain Scala UDF would re-read the literal
  * WKB for every row; PreparedGeometry additionally caches the query side's
  * edge index, making repeated intersects/contains tests ~5-20x faster on
  * complex polygons.
  *
  * Evaluation is interpreted (CodegenFallback): the JTS predicate dominates
  * the per-row cost, so codegen of the dispatch adds nothing.
  */
case class STPredicate(predicate: String, child: Expression, queryWkb: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val prepared: PreparedGeometry =
    PreparedGeometryFactory.prepare(GeomCodec.fromWkb(queryWkb))

  override def dataType: DataType = BooleanType
  override def prettyName: String = s"st_${predicate}_prepared"

  // Row-centric semantics: `predicate` relates the ROW geometry to the query,
  // i.e. "within" = row.within(query). The prepared object wraps the QUERY, so
  // asymmetric predicates invert: row.within(query) ⟺ prepared.contains(row).
  override def nullSafeEval(input: Any): Any = {
    val g = GeomCodec.fromWkb(input.asInstanceOf[Array[Byte]])
    predicate match {
      case "intersects" => prepared.intersects(g)
      case "within"     => prepared.contains(g)
      case "coveredby"  => prepared.covers(g)
      case "contains"   => prepared.within(g)
      case "covers"     => prepared.coveredBy(g)
      case "crosses"    => prepared.crosses(g)
      case "overlaps"   => prepared.overlaps(g)
      case "touches"    => prepared.touches(g)
      case "disjoint"   => prepared.disjoint(g)
      case other => throw new IllegalArgumentException(s"unknown predicate $other")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): STPredicate =
    copy(child = newChild)
}

object STPredicate {
  /** Row geometry `op` constant query geometry. NOTE the argument order
    * convention matches GeoFrame verbs: `within` means row-geometry within
    * the query; `contains` means the QUERY contains the row geometry.
    */
  def column(predicate: String, geomCol: Column, query: org.locationtech.jts.geom.Geometry): Column =
    GraftColumnBridge.column(
      STPredicate(predicate, GraftColumnBridge.expression(geomCol), GeomCodec.toWkb(query)))
}
