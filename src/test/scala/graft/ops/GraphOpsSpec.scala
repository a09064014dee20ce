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
}
