package graft.tools
import org.apache.spark.sql.functions._
object Q101Time {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("q101time", graft.Sessions.cpusFromEnv())
    val dir = "/root/testdata/sf0.1"
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[t] $label%-28s ${(System.nanoTime()-t0)/1e9}%6.2fs rows=$n")
    }
    for (i <- 1 to 3)
      t(s"q101 full pass $i") {
        graft.SparkEntry.queries("q101_knn_join")(spark, dir).count()
      }
    // stage split
    val e = graft.Tables.load(spark, dir, "embeddings")
    t("corpus count")(e.count())
    val base = graft.ops.VectorOps.kmeansCentroids(e, "embedding", 16, 4, 42L, 4096)
    t("kmeans (again)") { graft.ops.VectorOps.kmeansCentroids(e, "embedding", 16, 4, 42L, 4096).length.toLong }
    t("join+window only") {
      graft.ops.VectorOps.ivfKnnJoin(e, e, "vec_id", "embedding", 5, 16, 4, excludeSelf = true).count()
    }
    spark.stop()
  }
}
