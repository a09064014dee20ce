package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Stage-level decomposition of q162's FastSS join at 1x vs kx
  * replicated customer names (the SCALE.md q162 row): which stage
  * carries the ratio — the distinct, the variant explode, the
  * bucket-stats guard, the candidate join, or the levenshtein verify?
  */
object Q162Decomp {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.flatMap(_.toIntOption).getOrElse(64)
    val dir = "/root/testdata/sf0.1"
    val spark = Sessions.local("q162decomp", Sessions.cpusFromEnv(32))

    def names(scale: Int) = {
      val base = Tables.load(spark, dir, "customer").select(col("c_name"))
      (0 until scale).map { i =>
        val tag = s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
        base.select(concat(col("c_name"), lit(tag + tag)).as("c_name"))
      }.reduce(_ unionByName _)
    }
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[decomp] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs n=$n")
    }
    for (scale <- Seq(1, k)) {
      println(s"=== scale $scale ===")
      val words = names(scale).select(col("c_name").cast("string").as("w"))
        .na.drop().distinct()
      val keyed = words.select(col("w"), explode(array_distinct(expr(
        "concat(array(w), transform(sequence(1, length(w)), " +
          "i -> concat(substr(w, 1, i - 1), substr(w, i + 1))))")))
        .as("v"))
        .select(col("w"), xxhash64(col("v")).as("vh"))
      t("distinct_words")(words.count())
      t("variants")(keyed.count())
      t("bucket_stats")(keyed.groupBy("vh").agg(count(lit(1)).as("n"))
        .agg(max("n")).head().getLong(0))
      val cands = keyed.as("a").join(keyed.as("b"), "vh")
        .filter(col("a.w") < col("b.w"))
        .select(col("a.w").as("w1"), col("b.w").as("w2"))
        .distinct()
      t("cand_join_distinct")(cands.count())
      t("verify")(cands.filter(levenshtein(col("w1"), col("w2")) === 1).count())
      t("full_op")(graft.ops.TextAnalysis
        .editDistance1Pairs(names(scale), "c_name").count())
    }
    spark.stop()
  }
}
