package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions registering graft's native Catalyst functions —
  * the official extension point (`spark.sql.extensions=
  * graft.functions.GraftExtensions`, set by [[graft.Sessions]]), so the
  * functions resolve by name (`call_function("vec_dot_f", ...)` or SQL)
  * on any executor without driver-side registry mutation.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      new FunctionIdentifier("vec_dot_f"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot_f"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "vec_dot_f expects exactly 2 arguments")
        FloatVecDot(children.head, children(1))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "poly_hash expects exactly 1 argument")
        PolyHash(children.head, graft.ext.NearDup.Seed, graft.ext.NearDup.P)
      }))
    extensions.injectFunction((
      new FunctionIdentifier("simhash_bits"),
      new ExpressionInfo(classOf[SimhashBits].getName, "simhash_bits"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "simhash_bits expects (array, bits)")
        val bits = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"simhash_bits bits argument must be an integer literal, got $other")
        }
        SimhashBits(children.head, bits)
      }))
  }
}
