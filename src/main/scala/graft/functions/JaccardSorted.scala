package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Set Jaccard of two SORTED distinct long arrays via a single merge
  * walk — `|A∩B| / (|A| + |B| − |A∩B|)`, no hash set per pair.
  *
  * The composed formulation (`size(array_intersect(a, b))`) allocates
  * and populates a hash set for one side on EVERY pair — the dominant
  * per-candidate cost of the exact re-rank once candidates are cheap
  * (ngram probe stress: 4 M pairs × ~40-element sets). Sorting happens
  * once per document at signature-build time (`array_sort` over the
  * distinct hash set), amortized over every pair the document
  * participates in.
  *
  * Jaccard is order-invariant, so values are identical to
  * [[graft.ext.NearDup.jaccard]] on the same sets (spec-asserted) and
  * the DuckDB mirror (`list_intersect` — set semantics) is untouched.
  * Inputs MUST be sorted ascending and duplicate-free; feed it from
  * `array_sort(shingle_hash_set(...))`.
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_sorted expects (array<bigint>, array<bigint>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSorted.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val r = ctx.freshName("r")
      // boxed so two-empty-sets can yield NULL like the composed form's
      // divide-by-zero (both engines drop the pair); one box per pair
      // is noise next to the merge walk
      s"""
         |java.lang.Double $r = graft.functions.JaccardSorted.compute($x, $y);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaccard_sorted"
}

object JaccardSorted {

  /** Null when both sets are empty — 0/0 is NULL in both the Spark
    * composed form (divide by zero) and the DuckDB mirror, and the
    * threshold filters drop it; returning NaN here would instead PASS
    * Spark's NaN-is-greatest comparisons and emit spurious pairs.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = n + m - inter
    if (union == 0) null else inter.toDouble / union
  }
}
