package graft.tools

import graft.Sessions
import graft.ops.LexIndex
import org.apache.spark.sql.functions._

/** Round-16 verdict Next #6: the phrase/proximity 64× rows price a
  * positional build+probe, but not the STEADY STATE a long-lived
  * positional index converges to — N appends with `ps` position
  * arrays riding every posting row, probe wall as append litter
  * accumulates, then the purge and compaction knees over the heavier
  * positional rows. This probe is [[GateSteadyProbe]] for the lexical
  * positional layout.
  *
  * Usage: runMain graft.tools.LexSteadyProbe [totalDocs] [batches]
  * Defaults: 640k docs (64× the sf0.1 documents corpus) over 32
  * batches, ~40 tokens/doc from a 24-word vocabulary (so phrase and
  * proximity candidates exist at every batch). Probes measured at
  * checkpoints: single-term BM25 (reads tf only — parquet column
  * pruning should keep the `ps` arrays unpaid), exact phrase,
  * proximity, and the repeated-term phrase path.
  */
object LexSteadyProbe {
  def main(args: Array[String]): Unit = {
    val total = args.headOption.flatMap(_.toIntOption).getOrElse(640000)
    val batches = args.lift(1).flatMap(_.toIntOption).getOrElse(32)
    val spark = Sessions.local("lexsteady", Sessions.cpusFromEnv(32))
    val tmp = java.nio.file.Files.createTempDirectory("graft_lexsteady").toString
    val idx = s"$tmp/idx"
    val perBatch = total / batches
    import spark.implicits._

    val vocab = array((0 until 24).map(i => lit(s"v$i")): _*)
    def docs(lo: Long, hi: Long) =
      spark.range(lo, hi).toDF("doc_id")
        .withColumn("text", array_join(transform(sequence(lit(0), lit(39)),
          i => element_at(vocab,
            pmod(xxhash64(col("doc_id"), i), lit(24)).cast("int") + 1)), " "))

    LexIndex.bm25WriteIndex(docs(0, 0), "doc_id", "text", idx,
      buckets = 32, positional = true)

    def files(): Int = {
      val root = new org.apache.hadoop.fs.Path(s"$idx/postings")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def walk(p: org.apache.hadoop.fs.Path): Int =
        fs.listStatus(p).map { s =>
          if (s.isDirectory) walk(s.getPath)
          else if (!s.getPath.getName.startsWith("_") &&
            !s.getPath.getName.startsWith(".")) 1 else 0
        }.sum
      walk(root)
    }
    def sec(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def probes(): String = {
      val term = sec(LexIndex.bm25ProbeIndex(spark, idx, "doc_id",
        Seq("v3")).count())
      val phrase = sec(LexIndex.bm25PhraseProbe(spark, idx, "doc_id",
        Seq("v3", "v7")).count())
      val rep = sec(LexIndex.bm25PhraseProbe(spark, idx, "doc_id",
        Seq("v3", "v3")).count())
      val prox = sec(LexIndex.bm25ProximityProbe(spark, idx, "doc_id",
        Seq("v3", "v7"), window = 5).count())
      f"term=$term%.2fs phrase=$phrase%.2fs rep=$rep%.2fs prox=$prox%.2fs"
    }

    (0 until batches).foreach { b =>
      val ap = sec(LexIndex.bm25AppendIndex(
        docs(b.toLong * perBatch, (b + 1L) * perBatch),
        "doc_id", "text", idx))
      if (b % 8 == 7 || b == 0)
        println(f"LEXSTEADY batch=$b%3d append=$ap%.2fs ${probes()} files=${files()}")
      else println(f"LEXSTEADY batch=$b%3d append=$ap%.2fs")
    }
    // delete + purge a 1/64 slice: the positional rows must rewrite
    // whole (ps arrays ride) — the knee the per-row weight buys
    val delSec = sec(LexIndex.bm25DeleteIds(
      spark.range(0, total.toLong).toDF("doc_id")
        .filter(col("doc_id") % 64 === 3),
      "doc_id", idx))
    val purgeSec = sec(LexIndex.bm25PurgeIndex(spark, idx, "doc_id"))
    println(f"LEXSTEADY delete=$delSec%.2fs purge=$purgeSec%.2fs " +
      s"files=${files()}")
    val compactSec = sec(LexIndex.bm25CompactIndex(spark, idx))
    println(f"LEXSTEADY compact=$compactSec%.2fs ${probes()} files=${files()}")
    spark.stop()
  }
}
