package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native SimHash over a hash-set column (`array<bigint>` → bigint):
  * bit b of the result is the majority vote of bit b across the
  * element hashes — exactly [[graft.ext.NearDup.simhashHof]], which
  * builds `bits` separate interpreted `filter`+`size` passes over the
  * array; this expression makes ONE compiled pass accumulating all
  * bit counts.
  */
case class SimhashBits(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits > 0 && bits <= 62, s"bits must be in [1,62], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_bits expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < bits) {
        counts(b) += ((h >> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (2 * counts(b) > n) out |= 1L << b
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $x.numElements();
         |final int[] $counts = new int[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $x.getLong($i);
         |  for (int $b = 0; $b < $bits; $b++) {
         |    $counts[$b] += (int) (($h >> $b) & 1L);
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if (2 * $counts[$b] > $n) $out |= 1L << $b;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashBits =
    copy(child = newChild)

  override def prettyName: String = "simhash_bits"
}
