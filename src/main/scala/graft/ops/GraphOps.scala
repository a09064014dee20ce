package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components — the operator that turns a near-dup
  * PAIR relation into dedup GROUPS (keep one representative per
  * component, drop the rest).
  *
  * Implementation is iterative minimum-label propagation on DataFrames:
  * every node repeatedly adopts the smallest label among itself and its
  * neighbors until a fixpoint. Each iteration is one shuffle on the edge
  * relation; convergence for near-dup graphs is fast because components
  * are tiny (duplicate clusters), so the loop runs O(component diameter)
  * times — the same regime where the alternating smallStar/largeStar
  * algorithm (Kiveris et al.) would be the next step if diameters grew.
  * The driver-side loop only checks a changed-count per iteration; all
  * data stays distributed.
  */
object GraphOps {

  /** @param edges two-column DataFrame (src, dst), undirected pairs
    * @param driverThreshold edge count at or below which the component
    *        computation runs as union-find on the driver (the broadcast-
    *        threshold pattern: a near-dup edge list is orders of
    *        magnitude smaller than the corpus, and a sub-million-edge
    *        graph costs more in per-iteration scheduling than in
    *        compute). Above it, the distributed label-propagation loop
    *        runs — same result, tested on both paths.
    * @return (node, component) — component = min node id reachable
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String = "id_a",
      dstCol: String = "id_b",
      maxIterations: Int = 50,
      driverThreshold: Long = 1000000L): DataFrame = {
    val spark = edges.sparkSession
    val pairs = edges.select(col(srcCol).cast("long"), col(dstCol).cast("long"))
    // One pass decides AND collects: take(threshold+1) either hands the
    // whole edge list to the driver path (it fit) or proves it's a big
    // graph — the edge computation never runs twice.
    val taken = pairs.take(driverThreshold.toInt + 1)
    if (taken.length <= driverThreshold)
      return driverUnionFind(spark, taken.map(r => (r.getLong(0), r.getLong(1))))
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .cache() // reused every iteration; bounded by the pair relation
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      // each node adopts min(own label, neighbors' labels, label's label)
      // — the last term is pointer jumping, which collapses chains in
      // O(log diameter) rounds instead of O(diameter)
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("node", "dst2"), col("dst") === col("dst2"))
        .select(col("src").as("node"), col("label"))
      val viaLabels = labels.as("a")
        .join(labels.as("b"), col("a.label") === col("b.node"))
        .select(col("a.node").as("node"), col("b.label").as("label"))
      // Superseded checkpoints are released by the ContextCleaner once
      // the previous `labels` reference drops out of scope — the loop
      // holds at most the current and in-flight copies strongly.
      // Checkpoint FIRST: the changed-count then runs against the
      // materialized result instead of re-executing the iteration's
      // whole lineage a second time.
      val next = labels.union(viaNeighbors).union(viaLabels)
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint(eager = true)
      val changed = next.as("n")
        .join(labels.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.label") =!= col("o.label"))
        .count()
      labels = next
      converged = changed == 0
      i += 1
    }
    sym.unpersist()
    labels.select(col("node"), col("label").as("component"))
  }

  /** Small-graph path: classic union-find with path compression on the
    * driver, component id normalized to the minimum member.
    */
  private def driverUnionFind(spark: SparkSession, es: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val out = parent.keys.toSeq.sorted.map(n => (n, find(n)))
    out.toDF("node", "component")
  }
}
