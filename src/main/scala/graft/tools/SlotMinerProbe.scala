package graft.tools

import graft.ops.{VectorOps, VideoHash}
import org.apache.spark.sql.functions._

/** Stage-level timing probe behind SCALE.md's slot-miner table: builds
  * an n-doc stub frame relation (5 slots/doc via the scalar kernel),
  * then times the packed-code cut, the solver count, the banded radius
  * mining, and the vote/align readouts separately — the measurements
  * that drove the 64→128→256-bit signature widening and the internal
  * packed cut (run with `runMain graft.tools.SlotMinerProbe 320000`).
  */
object SlotMinerProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(320000)
    val spark = graft.Sessions.local("slotminerprobe", graft.Sessions.cpusFromEnv(32))
    import spark.implicits._
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $tag t=${(System.nanoTime()-t0)/1e9}%6.2fs")
      r
    }
    val docs = spark.range(n.toLong).select(col("id").as("doc_id"),
      (pmod(col("id") * 37 + 11, lit(4000)) + 40).as("len"))
    val corp = docs.select(col("doc_id").as("vid"), col("doc_id").as("fid"),
        col("len"), explode(sequence(lit(0L), lit(4L))).as("slot"))
      .withColumn("seed", col("slot"))
    val twin = docs.filter(col("doc_id") % 100 === 0)
      .select((col("doc_id") + lit(10000000L)).as("vid"), col("doc_id").as("fid"),
        col("len"), explode(sequence(lit(0L), lit(4L))).as("slot"))
      .withColumn("seed", when(col("slot") === 0, lit(9L)).otherwise(col("slot")))
    val frames = time("build+checkpoint") {
      corp.unionAll(twin).as[(Long, Long, Long, Long, Long)]
        .map { case (vid, fid, len, slot, seed) =>
          (vid, slot, VideoHash.stubFrameDiffScalar(fid, len, seed)) }
        .toDF("doc_id", "slot", "frame_diff").localCheckpoint(true)
    }
    val fid = frames.select((col("doc_id") * 64 + col("slot")).as("fid"),
      col("frame_diff").as("v"))
    val cnt = time("solver count")(fid.count())
    val p = VectorOps.hammingParamsFor(cnt, 256, 6)
    println(s"[stage] solver nBands=${p.nBands} cost=${p.costPerVec}")
    time("mining warm") {
      VectorOps.hammingRadiusPairs(fid, "fid", "v", 6, p.nBands).count()
    }
    val m = time("mining") {
      VectorOps.hammingRadiusPairs(fid, "fid", "v", 6, p.nBands).count()
    }
    println(s"[stage] matches=$m")
    time("votes") {
      VectorOps.slotVotePairs(frames, "doc_id", "slot", "frame_diff", 6, 0, 3).count()
    }
    time("align") {
      VectorOps.slotAlignPairs(frames, "doc_id", "slot", "frame_diff", 6, 0, 3).count()
    }
    time("votes again") {
      VectorOps.slotVotePairs(frames, "doc_id", "slot", "frame_diff", 6, 0, 3).count()
    }
    spark.stop()
  }
}
