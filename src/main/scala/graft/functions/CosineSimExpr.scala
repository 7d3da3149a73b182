package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two numeric arrays as ONE fused codegen loop —
  * the hot scalar of the whole ANN family (brute-force scans, IVF probe
  * scoring, rerank passes, near-dup verify).
  *
  * The composed `zip_with`+`aggregate` higher-order form walks each array
  * four times through per-element lambda dispatch outside whole-stage
  * codegen's fast path; this expression emits a single Java loop reading
  * both `ArrayData`s in place (float elements widen inline — no casted
  * copy of the array is materialized).
  *
  * Semantics are BIT-IDENTICAL to the HOF composition it replaces:
  * left-to-right accumulation of dot/‖a‖²/‖b‖² then dot/(√na·√nb); null
  * array, length mismatch, or any null element → null (exactly the HOF
  * null-propagation), zero vectors → NaN either way.
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t @ (DoubleType | FloatType), _) => t
    case other => throw new IllegalArgumentException(
      s"cosine_sim needs array<float|double> inputs, got $other")
  }

  @transient private lazy val lDouble = elemType(left) == DoubleType
  @transient private lazy val rDouble = elemType(right) == DoubleType

  /** Boxed fallback for interpreted paths — same loop, same order. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rDouble) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemType(left) == DoubleType) "getDouble" else "getFloat"
    val getR = if (elemType(right) == DoubleType) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val bad = ctx.freshName("bad")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    final double $xv = (double) $a.$getL($i);
         |    final double $yv = (double) $b.$getR($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {
  /** Column facade: cosine of two array<float|double> columns. */
  def column(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
