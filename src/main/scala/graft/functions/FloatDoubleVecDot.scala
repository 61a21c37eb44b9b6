package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product of an `array<float>` column with an
  * `array<double>` column — the projection-constant variant of
  * [[FloatVecDot]].
  *
  * Why a second expression instead of widening vec_dot_f: the LSH
  * hyperplanes ([[graft.ext.Similarity.bucketId]]) and IVF centroids
  * ([[graft.ext.IvfIndex]]) are double-precision PLAN LITERALS dotted
  * against the float corpus column, so the hot map-side path was
  * falling back to the interpreted higher-order-function formulation —
  * 16-32 interpreted dots of 64 elements per row (round-2 verdict
  * item 5). Keeping the (float, float) and (float, double) signatures
  * as separate strict expressions preserves vec_dot_f's oracle-pinned
  * semantics while giving the projection dots the same codegen'd tight
  * loop.
  *
  * Semantics: elements multiply in double (float side cast exactly),
  * sequential left-to-right sum — bit-identical to
  * `aggregate(zip_with(...))` over the same inputs (spec-asserted).
  * Length mismatch → null; null input → null (BinaryExpression
  * null-intolerance).
  */
case class FloatDoubleVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def is(dt: DataType, elem: DataType): Boolean = dt match {
      case ArrayType(e, _) => e == elem
      case _ => false
    }
    if (is(left.dataType, FloatType) && is(right.dataType, DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"vec_dot_fd expects (array<float>, array<double>), " +
          s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var sum = 0.0
      var i = 0
      while (i < n) {
        sum += x.getFloat(i).toDouble * y.getDouble(i)
        i += 1
      }
      sum
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $sum += (double) $x.getFloat($i) * $y.getDouble($i);
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDoubleVecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot_fd"
}
