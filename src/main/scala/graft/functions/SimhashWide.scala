package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Wide SimHash: concatenates one 30-bit majority signature per rehash
  * function `h_k(x) = (a_k·x + b_k) mod P` into a single long —
  * k=2 gives the 60-bit signature the banded near-dup query needs at
  * scale.
  *
  * Why width matters (measured, DevStress round 3): banded SimHash
  * candidate capacity is `2^(bits/(maxHamming+1))` buckets per band.
  * A 30-bit signature with hamming ≤ 3 gives 4 bands of ~7 bits — 128
  * bucket values — so past ~10⁴ documents every bucket holds hundreds
  * of docs and the candidate join went quadratic (58 s at 40 k docs
  * where MinHash took 9 s). 60 bits → 4 bands × 15 bits (32 768
  * values/band). The absolute `hamming ≤ 3` contract at growing width
  * is the standard large-scale design (Manku et al., WWW'07 — 64-bit,
  * 8 B pages); the base hash space is < 2³⁰, so extra signature bits
  * must come from independent REHASHES of the shingle hashes, not
  * higher bits of the original.
  *
  * One compiled pass: both rehashes and all 60 bit-counters per
  * element. The DuckDB oracle mirrors the identical formula with the
  * same (a_k, b_k) literals ([[graft.ext.NearDup.Sql.simhashWideSql]]);
  * NearDupSpec pins bit-equality against the composed HOF formulation.
  */
case class SimhashWide(child: Expression, as: Array[Long], bs: Array[Long],
    bitsPer: Int, mod: Long)
    extends UnaryExpression {

  require(as.length == bs.length && as.length * bitsPer <= 62,
    "rehash param arrays must align and total bits must fit a long")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_wide expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimhashWide.compute(input.asInstanceOf[ArrayData], as, bs, bitsPer, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", as, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.SimhashWide.compute($x, $asRef, $bsRef, $bitsPer, ${mod}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashWide =
    copy(child = newChild)

  override def prettyName: String = "simhash_wide"
}

object SimhashWide {

  def compute(arr: ArrayData, as: Array[Long], bs: Array[Long],
      bitsPer: Int, mod: Long): Long = {
    val k = as.length
    val n = arr.numElements()
    val counts = new Array[Int](k * bitsPer)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var ki = 0
      while (ki < k) {
        val v = (as(ki) * h + bs(ki)) % mod
        var b = 0
        while (b < bitsPer) {
          counts(ki * bitsPer + b) += ((v >> b) & 1L).toInt
          b += 1
        }
        ki += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < k * bitsPer) {
      if (2 * counts(b) > n) out |= 1L << b
      b += 1
    }
    out
  }
}
