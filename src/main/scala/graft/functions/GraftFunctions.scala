package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Registration + Column front ends for graft's native expressions.
  *
  * Registered through the session FunctionRegistry (Sessions.local does
  * this automatically) so both the SQL surface (`graft_dot(a, b)`) and
  * the Column API work; resolution happens at analysis time, which keeps
  * these inside whole-stage codegen.
  */
object GraftFunctions {

  val DotName = "graft_dot"
  val SimHashName = "graft_simhash"
  val MinHashName = "graft_minhash"
  val ShinglesName = "graft_shingles"

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      DotName, exprs => ArrayDotProduct(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      SimHashName, exprs => SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      MinHashName, exprs => MinHashSignature(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    reg.createOrReplaceTempFunction(
      ShinglesName, exprs => WordShingles(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
  }

  /** Native dot product (requires `register(spark)` — done by
    * [[graft.Sessions.local]]).
    */
  def dot(a: Column, b: Column): Column = call_function(DotName, a, b)

  /** Native 64-bit SimHash of an array<string> token column. */
  def simhash(toks: Column): Column = call_function(SimHashName, toks)

  /** Native MinHash signature (array<long> of `numHashes` mins). */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    call_function(MinHashName, shingles, org.apache.spark.sql.functions.lit(numHashes))

  /** Native distinct word n-gram shingles of a token array. */
  def shingles(toks: Column, n: Int): Column =
    call_function(ShinglesName, toks, org.apache.spark.sql.functions.lit(n))
}
