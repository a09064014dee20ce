package graft.tools

import graft.{Sessions, Tables}
import graft.ops.{Contamination, Sampling, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch probe: stage splits for the two un-decomposed 6×-band 64×
  * rows — q66_contamination and q97_perplexity_buckets — on the
  * disjoint-vocab replica corpus (per-shingle/token postings stay 1×
  * size, so both relations grow exactly k× by construction).
  *
  * q66 stages: containment pairs (shingle explode + posting join +
  * count agg) vs the top-1 window + roster left join on top.
  * q97 stages: unigramLogProb (token explode + freq join + per-doc
  * avg) vs the percentile cuts + bucket + final agg on top.
  */
object Q66Q97Decomp {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.flatMap(_.toIntOption).getOrElse(64)
    val spark = Sessions.local("q6697decomp", Sessions.cpusFromEnv(32))
    val dir = "/root/testdata/sf0.1"
    val tmp = java.nio.file.Files.createTempDirectory("graft_q6697").toString

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
      println(f"[q6697] $label%-30s $t%7.2f s rows=$c")
      t
    }

    for ((label, d) <- Seq(
        ("1x", Tables.load(spark, dir, "documents")),
        (s"${k}x", spark.read.parquet(s"$tmp/documents.parquet")))) {
      d.count(); d.count()
      val bench = d.filter(col("doc_id") % 20 === 0)

      def pairs(): DataFrame =
        Contamination.containmentPairs(d, bench, "doc_id", "text", 3)
      def q66(): DataFrame =
        Contamination.report(d, bench, "doc_id", "text", 3, 1)
      time(s"$label q66 pairs warm")(pairs().count())
      val tp = time(s"$label q66 pairs")(pairs().count())
      time(s"$label q66 full warm")(q66().count())
      val tf = time(s"$label q66 full")(q66().count())
      println(f"[q6697] $label q66 split: pairs=$tp%6.2f window+roster=${tf - tp}%6.2f")

      def scored(): DataFrame =
        TextAnalysis.unigramLogProb(d, "doc_id", "text")
          .join(d.select("doc_id", "n_chars"), Seq("doc_id"))
      def q97(): DataFrame =
        Sampling.quantileBucket(scored(), "lm_score", Seq(0.25, 0.5, 0.75))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"),
            round(avg(col("n_chars").cast("double")), 4).as("avg_chars"),
            round(avg("lm_score"), 6).as("avg_score"))
      time(s"$label q97 scored warm")(scored().count())
      val ts = time(s"$label q97 scored")(scored().count())
      time(s"$label q97 full warm")(q97().count())
      val tq = time(s"$label q97 full")(q97().count())
      println(f"[q6697] $label q97 split: scored=$ts%6.2f cuts+bucket+agg=${tq - ts}%6.2f")
    }
    spark.stop()
  }
}
