package graft.tools

import graft.{Sessions, Tables}
import graft.ops.{Dedup, GraphOps}
import org.apache.spark.sql.functions._

/** Scratch probe: where q100's 64× wall time goes. The query is three
  * stages — Jaccard edge generation (q22's machinery, own 64× ratio
  * 4.8), connected components (q50's, distributed-branch ratio 1.8),
  * and the per-cluster election window — and the round-8 table shows
  * the COMPOSITE at 6.9, the largest green ratio. This times each
  * stage at 1× and 64× (ScaleProbe's disjoint-vocab replica corpus, so
  * the edge relation grows exactly k×), with components+election also
  * timed over pre-materialized edges so the attribution does not
  * double-count edge generation.
  */
object Q100Decomp {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.flatMap(_.toIntOption).getOrElse(64)
    val spark = Sessions.local("q100decomp", Sessions.cpusFromEnv(32))
    val dir = "/root/testdata/sf0.1"
    val tmp = java.nio.file.Files.createTempDirectory("graft_q100").toString

    // ScaleProbe's documents replication: disjoint per-replica token
    // vocabulary, replica 0 byte-identical to 1×.
    val docs = Tables.load(spark, dir, "documents")
    val maxDid = docs.agg(max("doc_id")).head().getLong(0) + 1
    (0 until k).map { i =>
      val d = docs.withColumn("doc_id", col("doc_id") + lit(i * maxDid))
      if (i == 0) d
      else d.withColumn("text", regexp_replace(col("text"), "\\S+", s"$$0r$i"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val c = f
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[q100d] $label%-34s $t%7.2f s rows=$c")
      t
    }

    def q100(d: org.apache.spark.sql.DataFrame): Long = {
      val edges = Dedup.ngramJaccardPairsAuto(d, "doc_id", "text", 3, 0.5)
        .select("id_a", "id_b")
      val comps = GraphOps.connectedComponents(edges)
      val byComp = org.apache.spark.sql.expressions.Window.partitionBy("component")
      comps.join(d.select(col("doc_id").as("node"), col("n_chars")), Seq("node"))
        .withColumn("rn", row_number().over(
          byComp.orderBy(col("n_chars").desc, col("node"))))
        .withColumn("n_members", count(lit(1)).over(byComp))
        .filter(col("rn") === 1)
        .select(col("component"), col("node").as("canonical_id"), col("n_members"))
        .count()
    }

    for ((label, d) <- Seq(
        ("1x", Tables.load(spark, dir, "documents")),
        (s"${k}x", spark.read.parquet(s"$tmp/documents.parquet")))) {
      d.count(); d.count() // warm page cache
      time(s"$label edges warm")(
        Dedup.ngramJaccardPairsAuto(d, "doc_id", "text", 3, 0.5).count())
      val te = time(s"$label edges")(
        Dedup.ngramJaccardPairsAuto(d, "doc_id", "text", 3, 0.5).count())
      // components + election over pre-materialized edges
      Dedup.ngramJaccardPairsAuto(d, "doc_id", "text", 3, 0.5)
        .select("id_a", "id_b")
        .write.mode("overwrite").parquet(s"$tmp/edges_$label.parquet")
      val edges = spark.read.parquet(s"$tmp/edges_$label.parquet")
      edges.count()
      def ccElect(): Long = {
        val comps = GraphOps.connectedComponents(edges)
        val byComp = org.apache.spark.sql.expressions.Window.partitionBy("component")
        comps.join(d.select(col("doc_id").as("node"), col("n_chars")), Seq("node"))
          .withColumn("rn", row_number().over(
            byComp.orderBy(col("n_chars").desc, col("node"))))
          .withColumn("n_members", count(lit(1)).over(byComp))
          .filter(col("rn") === 1).count()
      }
      time(s"$label cc+elect warm")(ccElect())
      val tc = time(s"$label cc+elect")(ccElect())
      time(s"$label full q100 warm")(q100(d))
      val tf = time(s"$label full q100")(q100(d))
      println(f"[q100d] $label split: edges=$te%6.2f cc+elect=$tc%6.2f " +
        f"full=$tf%6.2f (edges+cc=${te + tc}%6.2f)")
    }
    spark.stop()
  }
}
