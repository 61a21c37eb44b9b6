package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product of two `array<float>` columns, in double
  * precision — a codegen'd Catalyst `Expression` replacing the
  * `zip_with` + `aggregate` formulation of [[graft.ext.Similarity.dotHof]].
  *
  * Why it exists (the brief's escalation ladder — built-ins first,
  * custom Expression only when the bench demands): Spark's higher-order
  * functions are evaluated INTERPRETED, one lambda invocation per
  * element — at 64 floats × millions of candidate pairs that is the
  * entire similarity-search hot path. This expression compiles to a
  * tight primitive loop inside whole-stage codegen.
  *
  * Semantics are pinned to the HOF version bit-for-bit: elements cast
  * float→double (exact), sequential left-to-right sum — so oracle
  * hashes are unchanged when swapping implementations
  * (FloatVecDotSpec asserts the bit-equality). Length mismatch → null
  * (the HOF version degenerates to null through null-padding too);
  * null input → null via default BinaryExpression null-intolerance.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"vec_dot_f expects (array<float>, array<float>), " +
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
        sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
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
         |    $sum += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot_f"
}
