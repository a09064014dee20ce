package graft.tools

import graft.Sessions
import graft.ops.{HammingIndex, Compaction}
import org.apache.spark.sql.functions._

/** Round-15 verdict Next #5: the streaming index gates (q219 phash /
  * q229 frame index) are exempt from the per-query 64× table by the
  * real-stream convention, but their append path has scale hazards
  * the batch probes never see (the round-15 small-file storm). This
  * probe measures the STEADY STATE the gates converge to: B ledgered
  * append batches into the persisted Hamming index (the gates' tuned
  * band geometry), per-batch append wall, post-append probe wall as
  * litter accumulates, file counts, and the compaction knee.
  *
  * Usage: runMain graft.tools.GateSteadyProbe [totalCodes] [batches]
  * Defaults: 128k codes (64× the sf0.1 embeddings corpus) over 32
  * batches. Vectors are deterministic xxhash sign patterns — the MIH
  * layout only ever sees their sign codes, so this is exactly the
  * gates' code volume without paying a decode.
  */
object GateSteadyProbe {
  def main(args: Array[String]): Unit = {
    val total = args.headOption.flatMap(_.toIntOption).getOrElse(128000)
    val batches = args.lift(1).flatMap(_.toIntOption).getOrElse(32)
    val spark = Sessions.local("streamgate", Sessions.cpusFromEnv(32))
    val tmp = java.nio.file.Files.createTempDirectory("graft_sgate").toString
    val idx = s"$tmp/idx"
    val perBatch = total / batches
    import spark.implicits._

    def vecs(lo: Long, hi: Long) =
      spark.range(lo, hi).toDF("vec_id")
        .withColumn("embedding", transform(sequence(lit(0), lit(63)),
          d => when(pmod(xxhash64(col("vec_id"), d), lit(2)) === 0, lit(1.0))
            .otherwise(lit(-1.0))))

    HammingIndex.hammingWriteIndex(vecs(0, 0), "vec_id", "embedding",
      idx, nBands = 8, nBuckets = 8, dim = 64)
    val queries = vecs(0, 64).localCheckpoint(true)

    def files(): Int = {
      val root = new org.apache.hadoop.fs.Path(s"$idx/bands")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def walk(p: org.apache.hadoop.fs.Path): Int =
        fs.listStatus(p).map { s =>
          if (s.isDirectory) walk(s.getPath)
          else if (!s.getPath.getName.startsWith("_") &&
            !s.getPath.getName.startsWith(".")) 1 else 0
        }.sum
      walk(root)
    }
    def probeSec(): Double = {
      val t0 = System.nanoTime()
      HammingIndex.hammingProbeIndex(spark, queries, "vec_id",
        "embedding", idx, radius = 15).count()
      (System.nanoTime() - t0) / 1e9
    }

    (0 until batches).foreach { b =>
      val t0 = System.nanoTime()
      graft.streaming.HammingIndexStream.appendBatch(
        vecs(100000L + b.toLong * perBatch, 100000L + (b + 1L) * perBatch),
        b.toLong, "vec_id", "embedding", idx, streamId = "sgate")
      val ap = (System.nanoTime() - t0) / 1e9
      if (b % 8 == 7 || b == 0)
        println(f"STREAMGATE batch=$b%3d append=$ap%.2fs probe=${probeSec()}%.2fs files=${files()}")
      else println(f"STREAMGATE batch=$b%3d append=$ap%.2fs")
    }
    val t0 = System.nanoTime()
    val rep = HammingIndex.hammingCompactIndex(spark, idx)
    println(f"STREAMGATE compact=${(System.nanoTime() - t0) / 1e9}%.2fs dirs=${rep.size} probe_after=${probeSec()}%.2fs files=${files()}")
    spark.stop()
  }
}
