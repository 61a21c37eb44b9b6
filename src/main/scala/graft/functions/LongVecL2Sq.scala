package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native squared L2 distance between two `array<long>` columns —
  * the integer-vector sibling of the vec_dot family, added for the PQ
  * hot path: [[graft.ext.Pq.encode]] evaluates N·M·K of these per
  * corpus pass, and the interpreted `aggregate(zip_with(...))`
  * formulation (per-row lambda dispatch + intermediate array
  * allocation) was the whole headline cost of `sim10_pq_adc_topk`
  * (6.3 s at sf0.1; see SCALING.md). Exact long arithmetic in
  * sequential order — bit-identical to the HOF reference and to the
  * DuckDB mirror's `sum((v-c)*(v-c))`, so swapping it in changes no
  * hashes. Length mismatch → null; null input → null.
  */
case class LongVecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def is(dt: DataType): Boolean = dt match {
      case ArrayType(e, _) => e == LongType
      case _ => false
    }
    if (is(left.dataType) && is(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"vec_l2sq_ll expects (array<bigint>, array<bigint>), " +
          s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var sum = 0L
      var i = 0
      while (i < n) {
        val d = x.getLong(i) - y.getLong(i)
        sum += d * d
        i += 1
      }
      sum
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val sum = ctx.freshName("sum")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sum = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $d = $x.getLong($i) - $y.getLong($i);
         |    $sum += $d * $d;
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVecL2Sq =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_l2sq_ll"
}
