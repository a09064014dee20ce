package graft.tools
import graft._
import org.apache.spark.sql.functions._
object KmProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("kmprobe", Sessions.cpusFromEnv(32))
    val emb64 = spark.read.parquet("/tmp/graft_emb64/embeddings.parquet")
    val twins = analytics.DataOpsQueries.twinCorpus(emb64)
    twins.count() // warm
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[km] $label ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val scale = 64
    time("kmeansCentroids k=1024 warm")(
      ops.VectorOps.kmeansCentroids(twins, "embedding", 16 * scale, sampleRows = 8 * 16 * scale))
    time("kmeansCentroids k=1024")(
      ops.VectorOps.kmeansCentroids(twins, "embedding", 16 * scale, sampleRows = 8 * 16 * scale))
    time("semDedup full warm")(
      ops.VectorOps.semDedup(twins, "vec_id", "embedding", threshold = 0.9,
        nClusters = 16 * scale, sampleRows = 8 * 16 * scale).count())
    time("semDedup full")(
      ops.VectorOps.semDedup(twins, "vec_id", "embedding", threshold = 0.9,
        nClusters = 16 * scale, sampleRows = 8 * 16 * scale).count())
    spark.stop()
  }
}
