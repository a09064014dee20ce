package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftExtensions, Sessions}

/** Proves the `spark.sql.extensions` registration path: builds a session
  * whose ONLY graft wiring is `withExtensions(new GraftExtensions)` (no
  * FunctionRegistry call) and resolves the native functions from SQL.
  * Must run in a fresh JVM — extensions bind at session construction.
  */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.withEngineConfigs(
      SparkSession.builder()
        .master("local[2]")
        .appName("graft-extensions-demo")
        .config("spark.sql.shuffle.partitions", "2")
        .withExtensions(new GraftExtensions))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       graft_simhash(array('a', 'b')) AS sh,
        |       size(graft_minhash(array('a', 'b'), 8)) AS mh,
        |       graft_shingles(array('a', 'b', 'c', 'b', 'c'), 2) AS sg,
        |       graft_srp(array(1.0d, -2.0d, 0.5d), 8, 0) AS srp,
        |       graft_normalize('  Hello,  World!! 42 ') AS nrm""".stripMargin).head()
    println(s"[ext] dot=${r.getDouble(0)} simhash=${r.getLong(1)} " +
      s"minhashLen=${r.getInt(2)} shingles=${r.getSeq[String](3).mkString(",")}")
    assert(r.getDouble(0) == 11.0)
    assert(r.getInt(2) == 8)
    assert(r.getSeq[String](3) == Seq("a b", "b c", "c b"))
    assert(r.getString(5) == "hello world 42", s"normalize gave '${r.getString(5)}'")
    // the aggregate function resolves through the same extension path
    val agg = spark.sql(
      """SELECT graft_vec_sum(v) AS s FROM (
        |  SELECT array(1.0d, 2.0d) v UNION ALL SELECT array(10.0d, 20.0d))""".stripMargin)
      .head().getSeq[Double](0)
    assert(agg == Seq(11.0, 22.0), s"vec_sum gave $agg")
    // the Misra-Gries aggregate resolves too: 'a' dominates the stream
    val mg = spark.sql(
      """SELECT graft_mg_topk(w, 2) AS s FROM (
        |  SELECT explode(array('a', 'a', 'a', 'b', 'c', 'a')) w)""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(mg.nonEmpty && mg.head.getString(0) == "a", s"mg_topk gave $mg")
    // nearest-centroid resolves and picks the aligned centroid (index 1)
    val nc = spark.sql(
      """SELECT graft_nearest_centroid(array(0.0d, 1.0d), 1.0d,
        |         array(1.0d, 0.0d, 0.0d, 1.0d), 2) AS c""".stripMargin)
      .head().getInt(0)
    assert(nc == 1, s"nearest_centroid gave $nc")
    // the directed-probe posting set resolves: exact bucket first, then
    // probes Hamming-1 neighbors of it
    val sp = spark.sql(
      """SELECT graft_srp(array(1.0d, -2.0d, 0.5d), 8, 0) AS b,
        |       graft_srp_probes(array(1.0d, -2.0d, 0.5d), 8, 0, 3) AS pb""".stripMargin)
      .head()
    val (bkt, pb) = (sp.getLong(0), sp.getSeq[Long](1))
    assert(pb.length == 4 && pb.head == bkt &&
      pb.tail.forall(x => java.lang.Long.bitCount(x ^ bkt) == 1),
      s"srp_probes gave bucket=$bkt pb=$pb")
    // the round-11 drift set: the six functions the extensions path was
    // MISSING while each path spelled its own list — now injected from
    // the shared builders table, each must resolve from SQL here
    val rh = spark.sql(
      """SELECT graft_rolling_hashes(array('a', 'b', 'c'), 2) AS rh""")
      .head().getSeq[Long](0)
    assert(rh.length == 2 && rh.distinct.length == 2, s"rolling_hashes gave $rh")
    val hier = spark.sql(
      """SELECT graft_nearest_centroids(array(0.0d, 1.0d), 1.0d,
        |         array(1.0d, 0.0d, 0.0d, 1.0d), 2, 1) AS t""".stripMargin)
      .head().getSeq[Int](0)
    assert(hier == Seq(1), s"nearest_centroids gave $hier")
    val pq = spark.sql(
      """SELECT graft_pq_codes(array(0.9d, 0.1d),
        |         array(0.0d, 1.0d, 0.0d, 1.0d), 2, 1) AS c""".stripMargin)
      .head().getSeq[Int](0)
    assert(pq == Seq(1, 0), s"pq_codes gave $pq")
    val adc = spark.sql(
      """SELECT graft_pq_adc(
        |         graft_pq_codes(array(0.9d, 0.1d),
        |           array(0.0d, 1.0d, 0.0d, 1.0d), 2, 1),
        |         array(5.0d, 7.0d, 11.0d, 13.0d), 2) AS s""".stripMargin)
      .head().getDouble(0)
    assert(adc == 7.0 + 11.0, s"pq_adc gave $adc")
    val bpe = spark.sql(
      """SELECT graft_bpe_encode(array('ab'), array('a'), array('b')) AS t""")
      .head().getSeq[String](0)
    assert(bpe == Seq("ab"), s"bpe_encode gave $bpe")
    val wn = spark.sql(
      """SELECT graft_winnow(array('a', 'b', 'c', 'd', 'e'), 2, 2) AS f""")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(wn.nonEmpty && wn.map(_.getInt(0)) == wn.map(_.getInt(0)).sorted,
      s"winnow gave $wn")
    val bloomOk =
      try { spark.sql("SELECT graft_bloom_contains(NULL, 1L)").head(); true }
      catch { case _: org.apache.spark.sql.catalyst.ExtendedAnalysisException => false
              case _: org.apache.spark.sql.AnalysisException => false }
    assert(bloomOk, "bloom_contains did not resolve through the extension path")
    println("[ext] OK: extensions-injected functions resolve from SQL")
    spark.stop()
  }
}
