package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native distinct k-shingle hash set: token array → `array<long>` of
  * the polynomial code-point hashes ([[PolyHash]] semantics) of every
  * k-token shingle, first-occurrence-deduplicated — the whole dedup
  * signature-build stage as ONE expression.
  *
  * Why: the composed formulation
  * (`array_distinct(transform(shingles(tokens,k), poly_hash))`)
  * materializes every shingle STRING (`concat_ws` over a `slice`) and
  * pays interpreted ArrayTransform lambda calls per element before the
  * native hash even runs — profiled as the dominant cost of every
  * near-dup query (the signature build was ~56% of dedup_minhash_pairs
  * wall time at sf0.1). This expression hashes the shingle directly
  * from the token bytes — char loop over `token_i .. token_{i+k-1}`
  * with a single space (32) folded between tokens — allocating no
  * intermediate strings. Fewer than k tokens → empty set, matching
  * [[graft.ext.NearDup.shingles]]'s guard.
  *
  * Equivalence with the composed form is bit-for-bit BECAUSE hashing
  * distinct shingle strings and deduplicating shingle hashes agree up
  * to hash collisions (P ≈ 1e9+7), and the DuckDB oracle mirrors the
  * hash-set-distinct form exactly (`list_distinct(list_transform(..))`)
  * — both engines see identical sets even in a collision.
  * NearDupSpec asserts equality with the composed formulation.
  */
case class ShingleHashSet(child: Expression, k: Int, seed: Long, mod: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash_set expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashSet.compute(input.asInstanceOf[ArrayData], k, seed, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.ShingleHashSet.compute($x, $k, ${seed}L, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)

  override def prettyName: String = "shingle_hash_set"
}

object ShingleHashSet {

  /** One pass over the token array; called from both eval and codegen
    * (whole-stage codegen inlines the call — no interpreted expression
    * tree on the per-row path).
    */
  def compute(tokens: ArrayData, k: Int, seed: Long, mod: Long): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    // null elements → empty string; the input contract is a split()
    // token array (containsNull = false), this only prevents an NPE on
    // out-of-contract input
    val strs = new Array[String](n)
    var i = 0
    while (i < n) {
      strs(i) = if (tokens.isNullAt(i)) "" else tokens.getUTF8String(i).toString
      i += 1
    }
    // LinkedHashSet: dedup preserving first-occurrence order, the same
    // element order array_distinct produces for the composed form
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var start = 0
    while (start <= n - k) {
      var acc = seed
      var j = 0
      while (j < k) {
        if (j > 0) acc = (acc * 31 + 32) % mod // ' ' separator
        val s = strs(start + j)
        var ci = 0
        while (ci < s.length) {
          val cp = s.codePointAt(ci)
          acc = (acc * 31 + cp) % mod
          ci += Character.charCount(cp)
        }
        j += 1
      }
      seen.add(acc)
      start += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
