package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All random-hyperplane LSH bucket ids of an `array<float>` vector in
  * ONE fused native pass: for each of `tables` tables, bucket =
  * Σ_b (vec · plane_{t,b} >= 0) << b over `nbits` planes.
  *
  * Why an expression instead of composing vec_dot_fd per plane: the
  * composed [[graft.ext.Similarity.bucketId]] embeds tables×nbits
  * plane vectors as ARRAY LITERALS in the plan — a 16-table × 8-bit ×
  * 64-dim bank is 8192 doubles PER CALL SITE, and the LSH self-join
  * has two call sites. Analysis/optimization/codegen of those literal
  * forests dominated dedup_embedding_lsh's bench time (the same
  * plan-constant blowup minhash_sigs killed in round 3). Here the
  * plane matrix rides along as one reference object ([t][b][d]
  * flattened), and the per-row work is a flat triple loop.
  *
  * Arithmetic contract: per plane, sequential left-to-right
  * float→double products — bit-identical to vec_dot_fd and DuckDB
  * `list_dot_product`, so every sign decision (and therefore every
  * bucket id) matches the composed form and the mirrored oracle SQL
  * exactly (spec-asserted). Vector length ≠ `dim` → null; null → null.
  */
case class LshBuckets(child: Expression, planes: Array[Double],
    tables: Int, nbits: Int, dim: Int) extends UnaryExpression {

  require(planes.length == tables * nbits * dim,
    s"plane matrix must be tables*nbits*dim = ${tables * nbits * dim} doubles, got ${planes.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    if (vec.numElements() != dim) null
    else {
      val out = new Array[Long](tables)
      var t = 0
      while (t < tables) {
        var bucket = 0L
        var b = 0
        while (b < nbits) {
          val off = (t * nbits + b) * dim
          var s = 0.0
          var k = 0
          while (k < dim) {
            s += vec.getFloat(k).toDouble * planes(off + k)
            k += 1
          }
          if (s >= 0) bucket |= 1L << b
          b += 1
        }
        out(t) = bucket
        t += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, vec => {
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val bucket = ctx.freshName("bucket")
      val out = ctx.freshName("out")
      s"""
         |if ($vec.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $out = new long[$tables];
         |  for (int $t = 0; $t < $tables; $t++) {
         |    long $bucket = 0L;
         |    for (int $b = 0; $b < $nbits; $b++) {
         |      final int $off = ($t * $nbits + $b) * $dim;
         |      double $s = 0.0;
         |      for (int $k = 0; $k < $dim; $k++) {
         |        $s += (double) $vec.getFloat($k) * $planesRef[$off + $k];
         |      }
         |      if ($s >= 0) $bucket |= 1L << $b;
         |    }
         |    $out[$t] = $bucket;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)

  override def prettyName: String = "lsh_buckets"
}
