package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native k-permutation MinHash signature: shingle-hash set →
  * `array<long>` of `min_x((a_i·x + b_i) mod P)` for i < k, computed in
  * ONE pass over the input (k running minimums) instead of k separate
  * `array_min(transform(...))` columns — each of which re-scanned the
  * array with an interpreted per-element lambda (k=16 × ~10² elements
  * × every row was the residual hot path after the signature build went
  * native).
  *
  * The (a_i, b_i) parameters come from the same seeded generator the
  * DuckDB mirror embeds as literals ([[graft.ext.NearDup.minhashParams]]
  * / `NearDup.Sql.minhashCols`), so signatures stay bit-identical
  * cross-engine; NearDupSpec asserts equality with the composed
  * formulation. Empty input → empty signature (callers band on
  * signature columns, so empty sets simply generate no candidates —
  * `array_min` of an empty array would be null anyway).
  */
case class MinhashSigs(child: Expression, as: Array[Long], bs: Array[Long], mod: Long)
    extends UnaryExpression {

  require(as.length == bs.length, "minhash a/b parameter arrays must align")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects array<long>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinhashSigs.compute(input.asInstanceOf[ArrayData], as, bs, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", as, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.MinhashSigs.compute($x, $asRef, $bsRef, ${mod}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)

  override def prettyName: String = "minhash_sigs"
}

object MinhashSigs {

  /** One pass, k running minimums; called from eval and codegen. */
  def compute(hashes: ArrayData, as: Array[Long], bs: Array[Long], mod: Long): ArrayData = {
    val k = as.length
    val n = hashes.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      var i = 0
      while (i < k) {
        val v = (as(i) * h + bs(i)) % mod
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    if (n == 0) new GenericArrayData(Array.emptyLongArray)
    else new GenericArrayData(mins)
  }
}
