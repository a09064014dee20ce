package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SRP-LSH similarity join: embedding-cosine near-duplicate PAIRS
  * without the all-pairs cross product — the scale path for the
  * relation [[Dedup.embeddingNearDupPairs]] computes exactly.
  *
  * Same pipeline shape as [[Dedup.minhashLshPairs]]:
  * map (bucket sketch) → shuffle only (table, bucket, id) → per-bucket
  * equi-join → exact-cosine verify on the candidate pairs. The verify
  * step makes the output a SUBSET of the exact relation (precision 1);
  * recall is governed by (planes, tables, probing) and measured against
  * the exact relation in DedupSpec.
  *
  * Recall math (for parameter choice): two vectors at angle θ agree on
  * one hyperplane sign with p = 1 − θ/π. A table of `b` planes catches
  * the pair with p^b exactly, or p^b + b·p^(b−1)(1−p) with Hamming-1
  * probing; `t` independent tables make a miss (1 − catch)^t.
  *   - near-dup regimes: AT the cosine-0.9 boundary (p ≈ 0.856),
  *     16 planes × 8 tables gives recall ≈ 0.95 with Hamming-1 probing
  *     (≈ 0.50 without); recall rises fast above the boundary (≈ 0.999
  *     at cosine 0.95) because real near-dups sit well inside it. But
  *     NO fixed (planes, tables) is a 100 TB setting — planes must
  *     track log₂ n or the candidate join goes quadratic (measured:
  *     see [[srpParamsFor]]) — so the production entry point is
  *     [[srpNearDupPairsAuto]], which solves both knobs from the
  *     corpus size and this same recall math (q61 runs it).
  *   - loose thresholds (cosine ≈ 0.4, p ≈ 0.63): few planes + probing
  *     is required (q59 uses 5 × 12 → theoretical recall ≈ 0.997 at
  *     the boundary, higher inside it); candidate volume rises
  *     accordingly because a 0.4-cosine "join" is close to a random
  *     relation — LSH cannot be sublinear on a relation that is itself
  *     near-quadratic.
  *
  * 100 TB notes: buckets carry only (table, bucket, id) — the dim-D
  * vectors never enter the candidate shuffle; the verify join fetches
  * them once per surviving pair. `maxBucket` drops degenerate buckets
  * (e.g. the all-zero vector's) before the self-join, the same skew
  * guard as the MinHash path.
  */
object Similarity {

  /** Planes that hold expected SRP bucket occupancy near
    * `targetOccupancy` at corpus size `n`: ⌈log2(n / targetOccupancy)⌉.
    *
    * This is the knob that must TRACK the corpus. For fixed planes the
    * per-table candidate join emits ~ n²·(planes+1) / 2^planes rows —
    * QUADRATIC in n once buckets saturate, and invisible to the
    * `maxBucket` skew guard because the growth is diffuse (every bucket
    * fattens together, none crosses the cap). Measured at the 64×
    * scale probe: the 16-plane production regime that runs q61 in ~1 s
    * on 4k vectors took 230× longer on 256k vectors (mean occupancy 4
    * — harmless-looking — but ~66 probe postings per bucket per table);
    * re-probing with planes from this rule restored near-linear cost.
    * Recall at a given planes count is threshold-math, not corpus-size
    * math (see the object scaladoc), so growing planes with log n keeps
    * the SAME recall regime while keeping occupancy — and join volume
    * per row — constant. Floor 4 keeps tiny corpora off the degenerate
    * 1-bucket path.
    */
  def srpPlanesFor(n: Long, targetOccupancy: Int = 8): Int = {
    require(targetOccupancy >= 1, "targetOccupancy must be >= 1")
    if (n <= targetOccupancy) 4
    else math.max(4, math.ceil(
      math.log(n.toDouble / targetOccupancy) / math.log(2.0)).toInt)
  }

  /** Per-table probability that a pair AT cosine `threshold` lands in
    * the same bucket, with Hamming-1 probing — the closed form the
    * object scaladoc derives: p^b + b·p^(b−1)·(1−p), p = 1 − θ/π.
    */
  def srpCatchProb(planes: Int, threshold: Double): Double = {
    val p = 1.0 - math.acos(threshold) / math.Pi
    math.pow(p, planes) + planes * math.pow(p, planes - 1) * (1.0 - p)
  }

  /** (planes, tables) for corpus size `n` and cosine `threshold` —
    * the operating rule, solved instead of hand-tuned.
    *
    * For each candidate planes count b, the recall target FORCES the
    * table count (a boundary pair's miss is (1 − catch(b))^tables, so
    * tables = ⌈log(1−R) / log(1−catch(b))⌉ — n-independent), and the
    * expected per-row cost is then
    *
    *   tables(b) · [ (b+1)  +  (b+1)·n / 2^b ]
    *                 postings   probe-join feed
    *
    * The rule scans b and returns the cost minimum with tables ≤
    * `maxTables` (the cap rejects the degenerate tail where catch
    * collapses and tables explodes — at loose thresholds an uncapped
    * solver asks for hundreds of sketch passes).
    *
    * Why solved and not fixed: the feed term is where fixed planes go
    * QUADRATIC — ~n²·(b+1)/2^b rows per table once buckets saturate,
    * invisible to the maxBucket guard because the growth is diffuse
    * (every bucket fattens, none crosses the cap). Measured at the 64×
    * probe: the hand-tuned 16-plane/8-table regime that runs 4k vectors
    * in ~1 s took 230× longer on 256k vectors; the solved parameters
    * restore near-linear cost at the same recall target, which holds by
    * construction at every n. For tight thresholds the optimum tracks
    * log₂ n as intuition says; for loose ones (≈0.4) the minimum cost
    * itself grows ~linearly per row — the relation is near-quadratic
    * and no parameterization is sublinear on it (see the object
    * scaladoc).
    */
  def srpParamsFor(
      n: Long,
      threshold: Double,
      targetRecall: Double = 0.95,
      maxTables: Int = 64): (Int, Int) = {
    require(threshold > 0 && threshold < 1, s"threshold=$threshold not in (0,1)")
    require(targetRecall > 0 && targetRecall < 1, s"targetRecall=$targetRecall not in (0,1)")
    require(maxTables >= 1, "maxTables must be >= 1")
    val candidates = for {
      b <- 4 to 48
      c = srpCatchProb(b, threshold)
      if c > 0 && c < 1
      t = math.max(1, math.ceil(
        math.log(1.0 - targetRecall) / math.log(1.0 - c)).toInt)
      if t <= maxTables
    } yield {
      val feed = (b + 1).toDouble * n.toDouble / math.pow(2.0, b)
      (b, t, t * ((b + 1).toDouble + feed))
    }
    require(candidates.nonEmpty,
      s"srpParamsFor: recall $targetRecall at threshold $threshold unreachable " +
        s"within $maxTables tables for any planes in [4, 48] — relax the target " +
        "or raise maxTables")
    val (b, t, _) = candidates.minBy(_._3)
    (b, t)
  }

  /** Candidate pairs (id_a < id_b) sharing an SRP bucket in at least one
    * of `tables` hash tables — Hamming-1 probed: pairs whose buckets
    * differ by ONE plane sign in some table are also caught (the
    * dominant miss mode for SRP), at (planes+1)× posting volume on one
    * join side only.
    *
    * Skew bound: the exact-side guard drops buckets over `maxBucket`,
    * and probe postings are pruned to buckets that survived it, so a
    * join key's fan-in is ≤ maxBucket exact postings × (planes+1)·
    * maxBucket probed postings (each of the planes+1 contributing
    * neighbor buckets is itself capped) — the per-key worst case is
    * (planes+1)·maxBucket², bounded, not corpus-dependent.
    *
    * `coverageGuard` (opt-in) runs one small eager aggregate over the
    * per-bucket counts at PLAN BUILD time: if the skew guard would drop
    * EVERY posting (corpus ≫ 2^planes × maxBucket, e.g. too few
    * planes), the result would be silently empty — indistinguishable
    * from "no near-dups" — so that case throws, and dropping >50 %
    * warns on stderr. It is off by default because the check is a
    * second full pass over the bucketing subplan and makes a lazy plan
    * builder run cluster work; turn it on for unattended jobs where an
    * empty output would be trusted (DedupSpec pins both modes).
    */
  def srpCandidatePairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Int,
      tables: Int,
      maxBucket: Int = 10000,
      probe: Boolean = true,
      coverageGuard: Boolean = false): DataFrame = {
    val v = df.select(col(idCol), VectorOps.toDoubleVec(col(vecCol)).as("dv"))
    // One row per (table, exact bucket, id): the only payload that shuffles.
    val buckets = v.select(col(idCol),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("tbl"),
          VectorOps.srpBucket(col("dv"), planes, t * planes).as("bucket"))): _*)).as("tb"))
      .select(col(idCol), col("tb.tbl"), col("tb.bucket"))
    // Skew guard identical to minhashLshPairs: oversized buckets are tiny
    // by construction, so they broadcast as an anti-join.
    val bucketCounts = buckets.groupBy("tbl", "bucket")
      .agg(count(lit(1)).as("bucket_n"))
    val oversized = bucketCounts
      .filter(col("bucket_n") > maxBucket)
      .select("tbl", "bucket")
    if (coverageGuard) {
      val st = bucketCounts.agg(
        coalesce(sum("bucket_n"), lit(0L)).as("total"),
        coalesce(sum(when(col("bucket_n") > maxBucket, col("bucket_n"))
          .otherwise(0L)), lit(0L)).as("dropped")).head()
      val (total, dropped) = (st.getLong(0), st.getLong(1))
      if (total > 0 && dropped == total)
        throw new IllegalStateException(
          s"srpCandidatePairs: skew guard (maxBucket=$maxBucket) would drop ALL " +
            s"$total postings — every bucket is oversized, the result would be " +
            "silently empty. Raise maxBucket or planes (finer buckets).")
      if (total > 0 && dropped * 2 > total)
        System.err.println(
          s"[graft] srpCandidatePairs: skew guard dropped $dropped/$total postings " +
            s"(maxBucket=$maxBucket, planes=$planes) — recall may be poor; " +
            "consider more planes or a larger maxBucket.")
    }
    val capped = buckets.join(broadcast(oversized), Seq("tbl", "bucket"), "left_anti")
    // Probe side: each posting also lands in its Hamming-1 neighbor
    // buckets. Probing ONE side suffices — hamming(bx, by) <= 1 is
    // symmetric, and least/greatest+distinct canonicalizes the pair.
    // Probed postings aimed at a bucket the exact side dropped can join
    // nothing — prune them before they shuffle, which also makes the
    // per-key fan-in bound in the scaladoc tight.
    val probeSide =
      if (!probe) capped
      else capped.select(col(idCol),
        col("tbl"),
        explode(array_union(array(col("bucket")),
          transform(sequence(lit(0), lit(planes - 1)),
            p => col("bucket").bitwiseXOR(call_function("shiftleft", lit(1L), p))))).as("bucket"))
        .join(broadcast(oversized), Seq("tbl", "bucket"), "left_anti")
    // `id_p < id_f` instead of `=!=` + least/greatest: probing is
    // symmetric (hamming-0 pairs share a surviving bucket so both
    // orderings appear; hamming-1 pairs appear once per direction via
    // each side's XOR posting), so every caught pair arrives in BOTH
    // orders and keeping one halves the join output feeding the
    // distinct (8.9M -> 4.45M raw pairs at sf0.1, measured ~25% off
    // the q59 wall time). The one asymmetry: when the skew guard
    // dropped exactly one of a hamming-1 pair's two buckets, only one
    // ordering exists and the filter keeps it iff the probe side is
    // the smaller id — under heavy skew a per-table catch can halve,
    // across `tables` independent tables a negligible recall effect
    // (DedupSpec's recall gate covers the unskewed regimes exactly).
    probeSide.select(col("tbl"), col("bucket"), col(idCol).as("id_a"))
      .join(capped.select(col("tbl"), col("bucket"), col(idCol).as("id_b")),
        Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      // Dedup BEFORE verify: a pair that agrees in k tables would
      // otherwise pay k dim-D dot products; the id-pair distinct is a
      // narrow two-long shuffle (measured 11.5s → 6.5s at sf0.1 on the
      // verify-duplicates alternative).
      .distinct()
  }

  /** Near-duplicate pairs above a cosine threshold via SRP-LSH candidates
    * + exact verify. Output schema and rounding match
    * [[Dedup.embeddingNearDupPairs]] so recall is directly measurable.
    */
  def srpNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      planes: Int = 16,
      tables: Int = 8,
      maxBucket: Int = 10000,
      probe: Boolean = true,
      coverageGuard: Boolean = false): DataFrame = {
    // Zero-norm vectors excluded (cosine would be NaN, which Spark
    // orders ABOVE the threshold) — same contract as the exact relation
    // in Dedup.embeddingNearDupPairs.
    val v = df.select(col(idCol), VectorOps.toDoubleVec(col(vecCol)).as("dv"))
      .withColumn("nrm", VectorOps.l2Norm(col("dv")))
      .filter(col("nrm") > 0)
    val candidates =
      srpCandidatePairs(df, idCol, vecCol, planes, tables, maxBucket, probe, coverageGuard)
    candidates
      .join(v.select(col(idCol).as("id_a"), col("dv").as("v_a"), col("nrm").as("nrm_a")), Seq("id_a"))
      .join(v.select(col(idCol).as("id_b"), col("dv").as("v_b"), col("nrm").as("nrm_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(VectorOps.dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** [[srpNearDupPairs]] with (planes, tables) solved from the corpus
    * size by [[srpParamsFor]] — the caller states the semantic contract
    * (threshold, recall target, per-row candidate budget) and the knobs
    * that must track corpus size do so automatically. Costs one count()
    * over the input (cheap next to either a wrong-planes run or the
    * join itself); callers who know n can call [[srpParamsFor]] and the
    * explicit overload directly.
    */
  def srpNearDupPairsAuto(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      targetRecall: Double = 0.95,
      maxTables: Int = 64,
      maxBucket: Int = 10000,
      probe: Boolean = true,
      coverageGuard: Boolean = false): DataFrame = {
    val (planes, tables) = srpParamsFor(df.count(), threshold, targetRecall, maxTables)
    srpNearDupPairs(df, idCol, vecCol, threshold, planes, tables, maxBucket, probe, coverageGuard)
  }
}
