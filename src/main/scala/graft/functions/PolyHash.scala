package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial code-point hash:
  * `acc_0 = seed; acc = (acc*31 + codepoint) mod 1e9+7` — the
  * cross-engine hash primitive behind MinHash/SimHash signatures
  * ([[graft.ext.NearDup.charHash]]).
  *
  * The built-ins formulation (`aggregate(split(s,""), ...)`) allocates
  * a per-character array and makes one interpreted lambda call per
  * character — on a 100 TB corpus the shingle-hash stage IS the dedup
  * ingest cost. This expression walks the string's code points in one
  * codegen'd loop.
  *
  * Code-point iteration also pins the cross-engine contract more
  * faithfully than the HOF version: DuckDB's `string_split(s,'')`
  * yields code points, and so does this loop, for ALL of Unicode
  * (Spark's `split(s,"")` would shear astral characters into surrogate
  * halves). For BMP text the three agree bit-for-bit
  * (PolyHashSpec).
  */
case class PolyHash(child: Expression, seed: Long, mod: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = seed
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |final String $s = $x.toString();
         |long $acc = ${seed}L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  final int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31 + $cp) % ${mod}L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)

  override def prettyName: String = "poly_hash"
}
