package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.CosineSim

/** Session extensions registering graft's native Catalyst expressions
  * (the public injection route: `.config("spark.sql.extensions",
  * classOf[GraftExtensions].getName)` or `--conf spark.sql.extensions=...`
  * on spark-submit — no private Spark API touched).
  *
  * Callers that may run in a session built without the extension go
  * through [[graft.functions.TextFns.cosineIn]], which checks the
  * session's registry and falls back to the interpreted HOF formulation.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"cosine_sim takes 2 arguments, got ${children.length}")
        // input coercion at the registration seam (CosineSim assumes
        // double arrays; see the note there): float/int arrays widen
        def widen(e: Expression): Expression =
          if (e.dataType == ArrayType(DoubleType, containsNull = false)) e
          else Cast(e, ArrayType(DoubleType))
        CosineSim(widen(children.head), widen(children(1)))
      }))
  }
}

object GraftExtensions {
  /** Value for the `spark.sql.extensions` conf key. */
  val name: String = classOf[GraftExtensions].getName
}
