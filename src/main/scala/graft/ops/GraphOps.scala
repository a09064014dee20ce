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
  /** @param checkpointDir when set, per-iteration label materialization
    *        uses RELIABLE `df.checkpoint()` against this directory
    *        (written through the cluster's fault-tolerant store) instead
    *        of `localCheckpoint`. localCheckpoint blocks live on
    *        executor storage with NO recomputable lineage — on a
    *        1000-executor cluster one preempted executor fails the whole
    *        job mid-loop. Default stays local (fastest, fine for
    *        local[*] and short-lived jobs); cluster runs pass a
    *        checkpoint dir.
    *
    *        Storage is BOUNDED: iterations alternate between two
    *        subdirectories and each is cleared before reuse, so at most
    *        two label-set checkpoints exist at any time (a naive
    *        per-iteration checkpoint would retain every iteration —
    *        `spark.cleaner...cleanCheckpoints` defaults to false). The
    *        subdir of the FINAL iteration is kept: it backs the
    *        returned DataFrame. The session's previous checkpoint dir
    *        is restored before returning.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String = "id_a",
      dstCol: String = "id_b",
      maxIterations: Int = 50,
      driverThreshold: Long = 1000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = edges.sparkSession
    // Ids normalized to long on BOTH paths (the output schema must not
    // depend on which side of the threshold the graph lands). Edges with
    // a NULL or uncastable endpoint are DROPPED on both paths too — the
    // driver path would otherwise NPE on getLong while the distributed
    // path silently emitted a bogus (null, null) component.
    val pairs = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // The persisted pairs make the decide-and-collect single-cost: the
    // take() materializes (at most threshold+1 rows of) the edge lineage
    // once, and the big-graph loop reuses the persisted relation instead
    // of re-running the (potentially expensive) edge computation.
    // Thresholds are capped at the driver-array limit: a larger value
    // would overflow toInt into a negative/wrapped take() argument.
    val takeN = math.min(driverThreshold, Int.MaxValue - 2L).toInt
    val taken = pairs.take(takeN + 1)
    if (taken.length <= takeN) {
      pairs.unpersist()
      return driverUnionFind(spark, taken.map(r => (r.getLong(0), r.getLong(1))))
    }
    val sym = pairs
      .union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .cache() // reused every iteration; bounded by the pair relation
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    val prevCkptDir = spark.sparkContext.getCheckpointDir
    def clearDir(path: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
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
      val grouped = labels.union(viaNeighbors).union(viaLabels)
        .groupBy("node").agg(min("label").as("label"))
      val next = checkpointDir match {
        case Some(dir) =>
          // Alternate between two subdirs, clearing before reuse: the
          // subdir being overwritten holds iteration i-2's checkpoint,
          // which nothing references anymore (labels points at i-1).
          val sub = s"$dir/graft_cc_${i % 2}"
          clearDir(sub)
          spark.sparkContext.setCheckpointDir(sub)
          grouped.checkpoint(eager = true)
        case None => grouped.localCheckpoint(eager = true)
      }
      val changed = next.as("n")
        .join(labels.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.label") =!= col("o.label"))
        .count()
      // Iteration diagnostics (opt-in: -Dgraft.cc.verbose=true) — an
      // iterative distributed job's convergence behavior is otherwise
      // invisible in production logs; ScaleProbe reads these lines for
      // the pointer-jumping iteration-count row.
      if (sys.props.get("graft.cc.verbose").contains("true"))
        System.err.println(s"[graft] connectedComponents: iteration ${i + 1} " +
          s"changed=$changed checkpoint=${checkpointDir.fold("local")(_ => "reliable")}")
      labels = next
      converged = changed == 0
      i += 1
    }
    sym.unpersist()
    pairs.unpersist()
    if (checkpointDir.isDefined) {
      // drop the non-final subdir (the final one backs `labels`);
      // restore whatever checkpoint dir the caller had configured
      checkpointDir.foreach(dir => clearDir(s"$dir/graft_cc_${i % 2}"))
      prevCkptDir match {
        case Some(d) => spark.sparkContext.setCheckpointDir(d)
        case None => () // no public API to unset; doc'd in the scaladoc
      }
    }
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
