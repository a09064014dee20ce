package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** Production registration path for graft's native expressions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * makes `graft_dot`, `graft_simhash`, `graft_minhash`, `graft_shingles`
  * resolvable from any SQL context of the session — the cluster-wide
  * analog of the per-session `GraftFunctions.register` that
  * [[Sessions.local]] uses.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    def inject(name: String, builder: Seq[Expression] => Expression): Unit =
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    inject(GraftFunctions.DotName, exprs => ArrayDotProduct(exprs.head, exprs(1)))
    inject(GraftFunctions.SimHashName, exprs => SimHash64(exprs.head))
    inject(GraftFunctions.MinHashName, exprs => MinHashSignature(exprs.head,
      GraftFunctions.literalInt(exprs(1), GraftFunctions.MinHashName, "numHashes")))
    inject(GraftFunctions.ShinglesName, exprs => WordShingles(exprs.head,
      GraftFunctions.literalInt(exprs(1), GraftFunctions.ShinglesName, "n")))
  }
}
