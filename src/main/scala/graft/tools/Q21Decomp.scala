package graft.tools

import graft._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch probe: q21 (MinHash-LSH) candidate-stage experiments. The
  * round-11 stage decomposition (ScaleProbe `q21decomp`) attributes
  * the bulk of q21's wall to candidate generation — the bucket
  * self-join + pair distinct — so this compares the shipped dataflow
  * against a bucket-GROUPED variant: one `collect_list` agg per
  * (band, bucket) and map-side ordered-pair expansion, which trades
  * the self-join's second shuffle of the bucket relation for HOF pair
  * generation over ≤ maxBucket-sized lists.
  */
object Q21Decomp {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("q21decomp", Sessions.cpusFromEnv(32))
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
      println("[q21] built 64x corpus")
    }
    val d64 = spark.read.parquet(out)
    val d1 = Tables.load(spark, dir, "documents")

    // the now-shipped bucket-grouped path (WindowGroupLimit rank-prune
    // skew guard + collect_list + map-side ordered-pair expansion —
    // the `windowed` variant below, promoted after this probe's
    // measurements; kept calling through Dedup so the probe tracks
    // whatever ships)
    def shipped(d: DataFrame): DataFrame =
      ops.Dedup.minhashLshPairs(d, "doc_id", "text", 3, 32, 8, 0.5)

    // the pre-round-11 candidate dataflow, kept inline for the record:
    // skew anti-join, then a bucket SELF-join (two shuffles of the
    // bucket relation) with id_a < id_b folded into the condition
    def joined(d: DataFrame, maxBucket: Int = 1000): DataFrame = {
      val sets = d
        .select(col("doc_id"), ops.TextFunctions.shingleSet(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
      val buckets = sets
        .select(col("doc_id"),
          explode(ops.Dedup.lshBands(
            ops.Dedup.minhashSignature(col("sh"), 32), 8, 4)).as("bb"))
        .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
      val oversized = buckets.groupBy("band", "bucket")
        .agg(count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n") > maxBucket)
        .select("band", "bucket")
      val counted = buckets.join(broadcast(oversized), Seq("band", "bucket"), "left_anti")
      val a = counted.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
      val b = counted.select(col("band"), col("bucket"), col("doc_id").as("id_b"))
      val pairs = a.join(b, Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .distinct()
      pairs
        .join(sets.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(sets.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          round(ops.TextFunctions.jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
    }

    // variant C: single-shuffle skew guard — WindowGroupLimit rank
    // prune to maxBucket+1 per bucket (map-side pre-prune bounds what a
    // degenerate key ships), then collect_list reusing the window's
    // partitioning (no second exchange); a truncated bucket arrives at
    // exactly maxBucket+1 ids, so the size filter drops it EXACTLY as
    // the anti-join did
    def windowed(d: DataFrame, maxBucket: Int = 1000): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val sets = d
        .select(col("doc_id"), ops.TextFunctions.shingleSet(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
      val buckets = sets
        .select(col("doc_id"),
          explode(ops.Dedup.lshBands(
            ops.Dedup.minhashSignature(col("sh"), 32), 8, 4)).as("bb"))
        .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
      val w = Window.partitionBy("band", "bucket").orderBy("doc_id")
      val pairs = buckets
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= maxBucket + 1)
        .groupBy("band", "bucket")
        .agg(collect_list(col("doc_id")).as("ids"))
        .filter(size(col("ids")).between(2, maxBucket))
        .select(array_sort(col("ids")).as("ids"))
        .select(explode(flatten(transform(col("ids"), (x, i) =>
          transform(
            slice(col("ids"), i + lit(2), size(col("ids")) - i - lit(1)),
            y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
        .select(col("p.id_a"), col("p.id_b"))
        .distinct()
      pairs
        .join(sets.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(sets.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          round(ops.TextFunctions.jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
    }

    // result identity first (any speedup is void otherwise)
    val s1 = shipped(d1).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val g1 = joined(d1).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w1 = windowed(d1).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[q21] identity at 1x: shipped=${s1.size} joined=${g1.size} " +
      s"windowed=${w1.size} equal=${s1 == g1 && g1 == w1}")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"[q21] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$c")
    }
    for (rep <- 1 to 2) {
      time(s"shipped_1x#$rep")(shipped(d1).count())
      time(s"joined_1x#$rep")(joined(d1).count())
      time(s"windowed_1x#$rep")(windowed(d1).count())
      time(s"shipped_64x#$rep")(shipped(d64).count())
      time(s"joined_64x#$rep")(joined(d64).count())
      time(s"windowed_64x#$rep")(windowed(d64).count())
    }
  }
}
