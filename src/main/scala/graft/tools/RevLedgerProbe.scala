package graft.tools

import graft.Sessions
import graft.ops.{CorpusUpsert, LexIndex}
import org.apache.spark.sql.functions._

/** Round-16 verdict Next #3's measured row: the rev ledger writes one
  * `revs/batch=<key>` dir per batch ever applied, and every later
  * batch's rev-assignment lookup (plus every [[CorpusUpsert
  * .currentRevs]] call) reads ALL of them — the same unbounded-litter
  * curve GateSteadyProbe measured for index appends, one layer up.
  * This probe prices N batches against a single BM25 target with the
  * [[CorpusUpsert.applyBatch]] auto-fold ON vs OFF: per-batch apply
  * wall (dominated by the rev lookup as dirs accumulate), currentRevs
  * wall at checkpoints, and the dir count.
  *
  * Usage: runMain graft.tools.RevLedgerProbe [batches] [docsPerBatch]
  * Defaults: 96 batches × 2k docs (each batch revises the same doc
  * window shifted by one — steady revision traffic, every lookup a
  * real max-rev fold).
  */
object RevLedgerProbe {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.flatMap(_.toIntOption).getOrElse(96)
    val perBatch = args.lift(1).flatMap(_.toIntOption).getOrElse(2000)
    val spark = Sessions.local("revledger", Sessions.cpusFromEnv(32))
    import spark.implicits._

    def run(tag: String, autoFoldAt: Int): Unit = {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_revprobe_$tag").toString
      val (ups, bm25) = (s"$tmp/ups", s"$tmp/bm25")
      LexIndex.bm25WriteIndex(
        spark.range(0).toDF("doc_id")
          .withColumn(CorpusUpsert.RidCol, col("doc_id"))
          .withColumn("text", lit("")).limit(0)
          .select(col(CorpusUpsert.RidCol), col("text")),
        CorpusUpsert.RidCol, "text", bm25, buckets = 16)
      val targets = Seq(CorpusUpsert.Bm25Target(bm25, "text"))
      def dirs(): Int = {
        val p = new org.apache.hadoop.fs.Path(s"$ups/revs")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(p)) 0
        else fs.listStatus(p).count(s =>
          s.isDirectory && s.getPath.getName.startsWith("batch="))
      }
      def curSec(): Double = {
        val t0 = System.nanoTime()
        CorpusUpsert.currentRevs(spark, ups).count()
        (System.nanoTime() - t0) / 1e9
      }
      (0 until batches).foreach { b =>
        val delta = spark.range(b.toLong, b.toLong + perBatch)
          .toDF("doc_id")
          .withColumn("text", concat(lit("tok v"), col("doc_id") % 17,
            lit(s" rev$b")))
        val t0 = System.nanoTime()
        CorpusUpsert.applyBatch(delta, "doc_id", f"b$b%04d", ups, targets,
          autoFoldRevsAt = autoFoldAt)
        val ap = (System.nanoTime() - t0) / 1e9
        if (b % 24 == 23 || b == 0)
          println(f"REVLEDGER $tag batch=$b%3d apply=$ap%.2fs " +
            f"currentRevs=${curSec()}%.2fs dirs=${dirs()}")
      }
      println(f"REVLEDGER $tag final currentRevs=${curSec()}%.2fs dirs=${dirs()}")
    }
    run("off", 0)
    run("on", 16)
    spark.stop()
  }
}
