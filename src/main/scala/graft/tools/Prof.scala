package graft.tools
import graft._
import graft.ops._
import org.apache.spark.sql.functions._
object Prof {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $label%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("prof", Sessions.cpusFromEnv(32))
    val docs = Tables.load(spark, dir, "documents")
    t("warmup count")(docs.count())
    val sets = docs.select(col("doc_id"), TextFunctions.shingleSet(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    t("shingleSet compute")(sets.count())
    t("shingleSet again")(sets.count())
    val sig = sets.select(col("doc_id"), Dedup.minhashSignature(col("sh"), 32).as("sig"))
    t("minhash sigs")(sig.count())
    val buckets = sets.select(col("doc_id"), explode(Dedup.lshBands(Dedup.minhashSignature(col("sh"), 32), 8, 4)).as("bb"))
    t("buckets")(buckets.count())
    t("full q21 pairs")(Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 32, 8, 0.5).count())
    t("full q22 pairs")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
    spark.stop()
  }
}
