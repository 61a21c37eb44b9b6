package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product of two `array<double>` columns — the third
  * signature in the vec_dot family ([[FloatVecDot]] float×float,
  * [[FloatDoubleVecDot]] float×double-literal).
  *
  * Why: L2-normalized embeddings are `array<double>` (the normalize
  * divide promotes), so every re-derivation over a normalized corpus —
  * sim6's renorm check, dot products over pre-normalized vectors where
  * cosine degenerates to a plain dot — was falling back to the
  * interpreted `aggregate(zip_with(...))` formulation (round-3 verdict
  * "what's wrong" item 2). Same contract as its siblings: sequential
  * left-to-right sum, bit-identical to the HOF reference
  * (spec-asserted) and to DuckDB `list_dot_product` over DOUBLE[].
  * Length mismatch → null; null input → null.
  */
case class DoubleVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def is(dt: DataType): Boolean = dt match {
      case ArrayType(e, _) => e == DoubleType
      case _ => false
    }
    if (is(left.dataType) && is(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"vec_dot_d expects (array<double>, array<double>), " +
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
        sum += x.getDouble(i) * y.getDouble(i)
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
         |    $sum += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleVecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot_d"
}
