package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-word token counter: token array → `array<long>` of
  * per-word occurrence counts for a FIXED word list (quality stopwords,
  * language-ID markers), in one pass over the tokens with a prebuilt
  * UTF8String hash index.
  *
  * The composed formulation costs one interpreted
  * `size(filter(toks, t === w))` scan PER WORD — the curation
  * enrichment (4 quality stopwords + 16 lang-ID markers) re-walked
  * every document's token array 20 times through interpreted lambdas.
  * Values are identical to the composed form (spec-asserted), so every
  * oracle mirror (`len(list_filter(...))` per word) is untouched.
  */
case class TokenFreqs(child: Expression, words: Array[String])
    extends UnaryExpression {

  require(words.distinct.length == words.length,
    s"token_freqs word list must be duplicate-free — the index would " +
      s"silently keep only the LAST slot of a duplicate word: " +
      words.mkString(", "))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_freqs expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // one index per expression instance, shared across rows (and across
  // the whole-stage-codegen reference to this object)
  @transient private lazy val index: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](words.length * 2)
    words.zipWithIndex.foreach { case (w, i) => m.put(UTF8String.fromString(w), i) }
    m
  }

  def count(tokens: ArrayData): ArrayData = {
    val counts = new Array[Long](words.length)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      // null elements can't match any word (split() never yields them,
      // but the type check admits containsNull arrays — don't NPE)
      if (!tokens.isNullAt(i)) {
        val idx = index.get(tokens.getUTF8String(i))
        if (idx != null) counts(idx) += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tokenFreqs", this, classOf[TokenFreqs].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $self.count($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenFreqs =
    copy(child = newChild)

  override def prettyName: String = "token_freqs"
}
