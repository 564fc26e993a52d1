package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's native expressions, injected via
  * `SparkSessionExtensions` (the registration path the build brief calls
  * out for custom operators):
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions)...
  * spark.sql("SELECT graft_polyhash(text) FROM docs")
  * }}}
  *
  * Both functions plan as the codegen'd expressions from [[Exprs]], so SQL
  * users get the same whole-stage-codegen kernels as the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[PolyHashExpr].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_polyhash"),
      info("graft_polyhash", "graft_polyhash(str) - engine-portable 31-ary rolling hash mod 1e9+7"),
      (children: Seq[Expression]) => PolyHashExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_seq_dot"),
      info("graft_seq_dot", "graft_seq_dot(a, b) - sequential-fold dot product of float arrays in double"),
      (children: Seq[Expression]) => SeqDotExpr(children(0), children(1))))
  }
}
