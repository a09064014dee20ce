package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("edges with NULL endpoints are dropped, not propagated or crashed on") {
    val edges = Seq(
      (Some(1L), Some(2L)),
      (None, Some(3L)),      // null src
      (Some(4L), None))      // null dst
      .toDF("id_a", "id_b")
    val out = GraphOps.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 1L), (2L, 1L))) // only the clean edge's nodes
  }

  test("connected components: chain, triangle, and singleton-pair topologies") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("id_a", "id_b")
    val got = GraphOps.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long path converges (diameter > a few iterations)") {
    val n = 30L
    val edges = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = GraphOps.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === n)
    assert(got.values.toSet === Set(1L))
  }

  test("distributed label-propagation path agrees with driver union-find") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L), (5L, 6L), (6L, 7L), (7L, 8L), (8L, 9L)).toDF("id_a", "id_b")
    val small = GraphOps.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = GraphOps.connectedComponents(edges, driverThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === small)
  }

  test("reliable-checkpoint mode ≡ localCheckpoint mode (cluster fault-tolerance path)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val local = GraphOps.connectedComponents(edges, driverThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reliable = GraphOps.connectedComponents(edges, driverThreshold = 0L,
        checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable === local)
    // the reliable path really wrote through the checkpoint dir
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, "df.checkpoint() left no files in the checkpoint dir")
    // bounded storage: only the final iteration's subdir survives, not
    // one checkpoint per iteration
    val subdirs = new java.io.File(dir).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("graft_cc_"))
    val nonEmpty = subdirs.count(d =>
      java.nio.file.Files.walk(d.toPath)
        .filter(p => java.nio.file.Files.isRegularFile(p)).count() > 0)
    assert(nonEmpty <= 1, s"checkpoints accumulated: ${subdirs.map(_.getName).mkString(",")}")
  }

  /** Independently written replay of pageRank's exact integer
    * recurrence — plain Scala maps, no Spark — so a distributed-plan
    * bug (lost dangling mass, wrong join side, float sneaking in)
    * cannot hide behind a shared implementation.
    */
  private def refPageRank(
      edges: Seq[(Long, Long)], iters: Int, scale: Long): Map[Long, Long] = {
    val es = edges.distinct
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val outdeg = es.groupBy(_._1).map { case (k, g) => k -> g.size.toLong }
    val base = scale / n
    val tele = (15L * base) / 100L
    var pr = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filter(v => outdeg.getOrElse(v, 0L) == 0L).map(pr).sum
      val inflow = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      es.foreach { case (u, v) => inflow(v) += pr(u) / outdeg(u) }
      pr = nodes.map(v =>
        v -> (tele + (85L * (inflow(v) + dang / n)) / 100L)).toMap
    }
    pr
  }

  test("pageRank ≡ in-memory integer reference, exactly, on a random digraph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val got = GraphOps.pageRank(edges.toDF("src", "dst"), iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === refPageRank(edges, 5, 1000000000000L))
  }

  test("pageRank dangling mass is redistributed, not lost: sink outranks spokes") {
    // star: 1..5 -> 99 (sink, outdeg 0). The sink's mass must cycle
    // back through the dangling term instead of draining to zero.
    val edges = (1L to 5L).map(u => (u, 99L))
    val pr = GraphOps.pageRank(edges.toDF("src", "dst"), iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(99L) > pr(1L), s"sink should dominate: $pr")
    // total mass conserved up to integer-truncation loss (< 1 unit per
    // node per division site per iteration)
    val total = pr.values.sum
    val scale = 1000000000000L
    assert(total <= scale && total > scale - 10L * 6 * 4, s"mass drifted: $total")
    assert(got0Uniform(edges.toDF("src", "dst")))
  }

  /** iterations = 0 → every node sits at the uniform base, exactly. */
  private def got0Uniform(edges: org.apache.spark.sql.DataFrame): Boolean = {
    val pr0 = GraphOps.pageRank(edges, iterations = 0)
      .collect().map(_.getLong(1)).toSet
    pr0.size == 1 && pr0.head == 1000000000000L / 6L
  }

  test("pageRank: duplicate edges collapse; more in-links → higher rank") {
    val once = GraphOps.pageRank(
      Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst"), iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dup = GraphOps.pageRank(
      Seq((1L, 3L), (1L, 3L), (2L, 3L), (2L, 4L), (2L, 4L)).toDF("src", "dst"),
      iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(once === dup)
    assert(once(3L) > once(4L), s"two in-links must beat one: $once")
  }

  test("labelPropagation: bridged cliques stay TWO communities where components would merge them") {
    // K4 on 1-4, K4 on 11-14, one bridge 4-11
    def clique(ns: Seq[Long]) =
      for (a <- ns; b <- ns if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(11L, 12L, 13L, 14L)) :+ (4L, 11L))
      .toDF("src", "dst")
    val lpa = GraphOps.labelPropagation(edges, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).map(lpa).toSet.size === 1, "clique A one label")
    assert(Seq(11L, 12L, 13L, 14L).map(lpa).toSet.size === 1, "clique B one label")
    assert(lpa(1L) !== lpa(11L), "bridge must NOT merge the communities")
    val cc = GraphOps.connectedComponents(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(1L) === cc(11L), "components DO merge over the bridge")
  }

  test("labelPropagation ≡ in-memory synchronous reference on a random graph; self-loops dropped; iterations=0 is identity") {
    val rnd = new scala.util.Random(7)
    val raw = (1 to 120).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    val df = raw.toDF("src", "dst")
    val got = GraphOps.labelPropagation(df, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: same deterministic synchronous update
    val und = raw.filter(p => p._1 != p._2)
      .flatMap(p => Seq(p, p.swap)).distinct
    val adj = und.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 4) {
      labels = adj.map { case (n, nbrs) =>
        val freq = nbrs.groupBy(labels).map { case (l, xs) => l -> xs.size }
        n -> freq.toSeq.map { case (l, c) => (c, -l) }.max._2 * -1
      }
    }
    assert(got === labels)
    val idty = GraphOps.labelPropagation(df, iterations = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(idty.forall(p => p._1 === p._2) && idty.map(_._1).toSet === adj.keySet)
  }
}
