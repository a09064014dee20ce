package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence pinning for the slot-keyed partial-overlap
  * machinery (VectorOps.slotVotePairs / slotAlignPairs /
  * slotProbePairs): on seeded random slot relations the distributed
  * banded miners must reproduce an independently written in-memory
  * brute force EXACTLY — votes, winning offsets (incl. the
  * smallest-offset tie rule), min hammings, and probe hits — across
  * randomized radii and both solver-chosen and forced band geometries.
  * The gate fixtures (q223–q227) pin planted twins; this suite pins
  * the machinery on relations with accidental structure.
  */
class SlotMinerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def packWords(diff: Array[Double]): Array[Long] =
    Array.tabulate((diff.length + 63) / 64) { w =>
      var word = 0L
      var i = 0
      while (i < 64 && w * 64 + i < diff.length) {
        if (diff(w * 64 + i) > 0.0) word |= (1L << i)
        i += 1
      }
      word
    }

  private def hamming(a: Array[Long], b: Array[Long]): Int = {
    var h = 0
    var i = 0
    while (i < a.length) { h += java.lang.Long.bitCount(a(i) ^ b(i)); i += 1 }
    h
  }

  /** Random slot relation: `n` parents × `slots` slots of `dim`-bit
    * diff vectors; a few parents share planted near-dup slots so the
    * miners always have signal, the rest is noise whose accidental
    * matches the brute force must agree on.
    */
  private def randomSlots(rng: scala.util.Random, n: Int, slots: Int,
      dim: Int): Seq[(Long, Int, Array[Double])] = {
    val rows = for (id <- 0 until n; s <- 0 until slots) yield
      (id.toLong, s, Array.fill(dim)(rng.nextDouble() - 0.5))
    // plant: parent 1 copies parent 0's slots shifted by one (an edit),
    // parent 2 copies slot 0 of parent 0 verbatim into every slot
    val byKey = rows.map(r => (r._1, r._2) -> r._3).toMap
    rows.map {
      case (1L, s, _) if s < slots - 1 => (1L, s, byKey((0L, s + 1)).clone())
      case (2L, s, _) => (2L, s, byKey((0L, 0)).clone())
      case r => r
    }
  }

  test("slotVotePairs and slotAlignPairs reproduce an in-memory brute force exactly on 25 seeded random relations") {
    for (trial <- 0 until 25) {
      val rng = new scala.util.Random(941 + trial)
      val dim = Seq(64, 128, 256)(trial % 3)
      val radius = 2 + rng.nextInt(7) // 2..8
      val minVotes = 2 + rng.nextInt(2) // 2..3
      val nBands = if (trial % 2 == 0) 0 else 8 // solver vs forced
      val rows = randomSlots(rng, n = 12, slots = 4, dim = dim)
      val df = rows.toDF("id", "slot", "v")

      // brute force over packed codes
      val codes = rows.map { case (id, s, d) => (id, s, packWords(d)) }
      val matches = for {
        (ia, sa, ca) <- codes
        (ib, sb, cb) <- codes
        if ia < ib
        h = hamming(ca, cb)
        if h <= radius
      } yield (ia, sa, ib, sb, h)
      val expVotes = matches.groupBy(m => (m._1, m._3)).collect {
        case ((a, b), ms)
            if ms.map(_._2).distinct.size >= minVotes =>
          (a, b, ms.map(_._2).distinct.size.toLong, ms.map(_._5).min.toLong)
      }.toSet
      val expAlign = matches.groupBy(m => (m._1, m._3)).flatMap {
        case ((a, b), ms) =>
          val byOff = ms.groupBy(m => (m._4 - m._2).toLong)
            .map { case (off, os) =>
              (off, os.map(_._2).distinct.size.toLong, os.map(_._5).min.toLong)
            }
          val (off, votes, mh) = byOff.toSeq
            .sortBy { case (o, v, _) => (-v, o) }.head
          if (votes >= minVotes) Some((a, b, off, votes, mh)) else None
      }.toSet

      val gotVotes = VectorOps.slotVotePairs(df, "id", "slot", "v",
          radius = radius, nBands = nBands, minVotes = minVotes)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(gotVotes === expVotes,
        s"trial $trial dim=$dim radius=$radius votes mismatch")

      val gotAlign = VectorOps.slotAlignPairs(df, "id", "slot", "v",
          radius = radius, nBands = nBands, minVotes = minVotes)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(gotAlign === expAlign,
        s"trial $trial dim=$dim radius=$radius align mismatch")
    }
  }

  test("slotProbePairs reproduces an in-memory brute force exactly on 10 seeded random relations (probes never pair with each other)") {
    for (trial <- 0 until 10) {
      val rng = new scala.util.Random(1709 + trial)
      val dim = Seq(64, 256)(trial % 2)
      val radius = 2 + rng.nextInt(7)
      val slotRows = randomSlots(rng, n = 10, slots = 4, dim = dim)
      // probes: one copies (3, slot 1) exactly, the rest random;
      // probe ids disjoint from parent ids
      val probeRows = (0 until 4).map { k =>
        val d = if (k == 0) slotRows.find(r => r._1 == 3L && r._2 == 1).get._3.clone()
          else Array.fill(dim)(rng.nextDouble() - 0.5)
        (100L + k, d)
      }
      val slotsDf = slotRows.toDF("id", "slot", "v")
      val probesDf = probeRows.toDF("pid", "pv")

      val slotCodes = slotRows.map { case (id, s, d) => (id, s, packWords(d)) }
      val probeCodes = probeRows.map { case (id, d) => (id, packWords(d)) }
      val expected = (for {
        (pid, pc) <- probeCodes
        (id, s, c) <- slotCodes
        h = hamming(pc, c)
        if h <= radius
      } yield (pid, id, s.toLong, h.toLong)).toSet

      val got = VectorOps.slotProbePairs(probesDf, "pid", "pv",
          slotsDf, "id", "slot", "v", radius = radius)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(got === expected, s"trial $trial dim=$dim radius=$radius")
    }
  }
}
