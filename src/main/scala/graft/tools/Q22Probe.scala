package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Scratch probe: q22 (exact n-gram Jaccard) shuffle-width experiments
  * on the 64× disjoint-vocabulary corpus — the round-8 search for the
  * remaining super-linearity after the hot-shingle cut was measured a
  * structural no-op here (maxDf 25 vs √P ≈ 4000).
  */
object Q22Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("q22probe", Sessions.cpusFromEnv(32))
    val dir = "/root/testdata/sf0.1"
    val out = "/tmp/graft_docs64/documents.parquet"
    if (!new java.io.File(out).exists) {
      val docs = Tables.load(spark, dir, "documents")
      val maxDid = docs.agg(max("doc_id")).head.getLong(0) + 1
      (0 until 64).map { i =>
        val d = docs.withColumn("doc_id", col("doc_id") + lit(i * maxDid))
        if (i == 0) d
        else d.withColumn("text", regexp_replace(col("text"), "\\S+", s"$$0r$i"))
      }.reduce(_ unionByName _).write.mode("overwrite").parquet(out)
      println("[q22] built 64x corpus")
    }
    val d64 = spark.read.parquet(out)
    val d1 = Tables.load(spark, dir, "documents")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"[q22] $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$c")
    }
    def run(d: org.apache.spark.sql.DataFrame): Long =
      ops.Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.5).count()
    // variant: sizes via any_value instead of grouping columns — the
    // pair agg's key narrows from (long, long, int, int) to (long, long)
    def runNarrow(d: org.apache.spark.sql.DataFrame): Long = {
      val idCol = "doc_id"; val threshold = 0.5
      val s = d.select(col(idCol),
          ops.TextFunctions.shingleSet(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
        .select(col(idCol), col("sh"), size(col("sh")).as("sz"))
      val ex = s.select(col(idCol), col("sz"), explode(col("sh")).as("shingle"))
      val lengthOk =
        col("sz_a") >= lit(threshold) * col("sz_b") &&
        col("sz_b") >= lit(threshold) * col("sz_a")
      val a = ex.select(col("shingle"), col(idCol).as("id_a"), col("sz").as("sz_a"))
      val b = ex.select(col("shingle"), col(idCol).as("id_b"), col("sz").as("sz_b"))
      a.join(b, Seq("shingle"))
        .filter(col("id_a") < col("id_b") && lengthOk)
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("c"),
          any_value(col("sz_a")).as("sz_a"), any_value(col("sz_b")).as("sz_b"))
        .select(col("id_a"), col("id_b"),
          round(col("c").cast("double") /
            (col("sz_a") + col("sz_b") - col("c")).cast("double"), 6).as("jaccard"))
        .filter(col("jaccard") >= threshold)
        .count()
    }
    time("64x base warm")(run(d64))
    time("64x base")(run(d64))
    time("64x narrow-key warm")(runNarrow(d64))
    time("64x narrow-key")(runNarrow(d64))
    time("64x base again")(run(d64))
    time("1x base")(run(d1))
    time("1x base")(run(d1))
    time("1x narrow-key")(runNarrow(d1))
    time("1x narrow-key")(runNarrow(d1))
    spark.stop()
  }
}
