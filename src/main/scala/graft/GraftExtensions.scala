package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions._

/** Production registration path for graft's native expressions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * makes every `graft_*` native (scalar, aggregate, and sketch)
  * resolvable from any SQL context of the session — the cluster-wide
  * analog of the per-session `GraftFunctions.register` that
  * [[Sessions.local]] uses. Both paths iterate the SAME
  * [[GraftFunctions.builders]] table, so the registered sets are equal
  * BY CONSTRUCTION — round 11 found this class six functions behind
  * the session path when each spelled its own list
  * (ExtensionsDemo smokes every table entry through this path).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, n, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        GraftFunctions.arity(name, n)(builder)))
    }
}
