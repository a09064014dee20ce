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
    * @return (node, component) — component = min node id reachable
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String = "id_a",
      dstCol: String = "id_b",
      maxIterations: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .cache() // reused every iteration; bounded by the pair relation
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      // each node adopts min(own label, neighbors' labels)
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("node", "dst2"), col("dst") === col("dst2"))
        .select(col("src").as("node"), col("label"))
      val next = labels.union(viaNeighbors)
        .groupBy("node").agg(min("label").as("label"))
      val changed = next.as("n")
        .join(labels.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.label") =!= col("o.label"))
        .count()
      labels = next.localCheckpoint(eager = true) // cut lineage per iteration
      converged = changed == 0
      i += 1
    }
    sym.unpersist()
    labels.select(col("node"), col("label").as("component"))
  }
}
