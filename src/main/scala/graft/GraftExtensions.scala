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
  * makes `graft_dot`, `graft_simhash`, `graft_minhash`, `graft_shingles`,
  * `graft_srp`, and the `graft_vec_sum` / `graft_mg_topk` aggregates
  * resolvable from any SQL context of the session — the
  * cluster-wide analog of the per-session `GraftFunctions.register` that
  * [[Sessions.local]] uses. The two paths MUST register the same set
  * (ExtensionsDemo smokes every function through this one).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    def inject(name: String, n: Int)(builder: Seq[Expression] => Expression): Unit =
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        GraftFunctions.arity(name, n)(builder)))
    inject(GraftFunctions.DotName, 2)(exprs => ArrayDotProduct(exprs.head, exprs(1)))
    inject(GraftFunctions.SimHashName, 1)(exprs => SimHash64(exprs.head))
    inject(GraftFunctions.MinHashName, 2)(exprs => MinHashSignature(exprs.head,
      GraftFunctions.literalInt(exprs(1), GraftFunctions.MinHashName, "numHashes")))
    inject(GraftFunctions.ShinglesName, 2)(exprs => WordShingles(exprs.head,
      GraftFunctions.literalInt(exprs(1), GraftFunctions.ShinglesName, "n")))
    inject(GraftFunctions.SrpName, 3)(exprs => SrpBucket(exprs.head,
      GraftFunctions.literalInt(exprs(1), GraftFunctions.SrpName, "planes"),
      GraftFunctions.literalInt(exprs(2), GraftFunctions.SrpName, "seedBase")))
    inject(GraftFunctions.SrpProbesName, 4)(exprs => SrpProbeBuckets(exprs.head,
      GraftFunctions.literalInt(exprs(1), GraftFunctions.SrpProbesName, "planes"),
      GraftFunctions.literalInt(exprs(2), GraftFunctions.SrpProbesName, "seedBase"),
      GraftFunctions.literalInt(exprs(3), GraftFunctions.SrpProbesName, "probes")))
    inject(GraftFunctions.VecSumName, 1)(exprs => VectorSum(exprs.head))
    inject(GraftFunctions.MgTopKName, 2)(exprs => MisraGriesTopK(exprs.head,
      GraftFunctions.literalInt(exprs(1), GraftFunctions.MgTopKName, "capacity")))
    inject(GraftFunctions.NearestCentroidName, 4)(GraftFunctions.buildNearestCentroid)
  }
}
