package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Four families, in increasing tolerance:
  *   - exact: hash-groupBy on the content key — one shuffle, scales flat
  *   - MinHash + LSH: near-dup candidates by banded signature join;
  *     the only all-pairs work is inside buckets
  *   - SimHash: 64-bit sketch + pigeonhole chunk blocking for small
  *     Hamming radius
  *   - exact n-gram Jaccard: the quadratic ground truth, used as the
  *     correctness oracle for the sketch-based paths at small scale
  *
  * 100 TB design notes: every pipeline here is
  * map (signature) → shuffle on a small key → bounded per-bucket work.
  * The quadratic `ngramJaccardPairs` exists for oracle parity and is NOT
  * the scale path; `minhashLshPairs` computes the same relation
  * approximately with a recall controlled by (numHashes, bands).
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup: group on the content column(s), keep the smallest id as
    * the canonical representative. Map-side partial aggregation makes the
    * shuffle carry one row per distinct content per input partition.
    */
  def exact(df: DataFrame, idCol: String, contentCols: Seq[String]): DataFrame =
    df.groupBy(contentCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  // -------------------------------------------------------------- minhash

  /** MinHash signature: for each of `numHashes` hash families, the
    * minimum of `xxhash64(seed, shingle)` over the document's shingle
    * set. Entirely array expressions — no UDF, no extra pass.
    */
  def minhashSignature(shingleSet: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(shingleSet, s => xxhash64(h, s))))

  /** LSH banding: split the signature into `bands` contiguous bands and
    * hash each, yielding (bandIndex, bandHash) bucket keys. Documents
    * sharing any bucket become candidate pairs.
    */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(slice(signature, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand))).as("bucket")))

  /** Near-duplicate pairs via MinHash + LSH, verified with exact Jaccard
    * on the shingle sets.
    *
    * @param maxBucket skew guard: buckets larger than this are dropped
    *                  (a degenerate bucket — e.g. the empty document —
    *                  would otherwise go quadratic). At production scale
    *                  this bound is what keeps the join from blowing up
    *                  on pathological content.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
      maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val withSig = df
      .select(col(idCol), TextFunctions.shingleSet(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val buckets = withSig
      .select(col(idCol), col("sh"), explode(lshBands(col("sig"), bands, r)).as("bb"))
      .select(col(idCol), col("sh"), col("bb.band"), col("bb.bucket"))
    // Skew guard: cap bucket size before the self-join.
    val counted = buckets
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")
    val a = counted.select(col("band"), col("bucket"),
      col(idCol).as("id_a"), col("sh").as("sh_a"))
    val b = counted.select(col("band"), col("bucket"),
      col(idCol).as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), TextFunctions.jaccard(col("sh_a"), col("sh_b")).as("jac"))
      .filter(col("jac") >= threshold)
      .groupBy("id_a", "id_b")
      .agg(round(first(col("jac")), 6).as("jaccard"))
  }

  // ----------------------------------------------------- exact n-gram Jaccard

  /** Ground-truth near-dup relation: all pairs with shingle-set Jaccard
    * >= threshold. Quadratic — the oracle for `minhashLshPairs`, not a
    * scale path.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val s = df.select(col(idCol), TextFunctions.shingleSet(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
    val a = s.select(col(idCol).as("id_a"), col("sh").as("sh_a"))
    val b = s.select(col(idCol).as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(TextFunctions.jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash over the token multiset: each token's xxhash64
    * contributes ±1 per bit position; the sketch takes the sign of each
    * accumulated position. One pass of array expressions per row.
    */
  def simhash(toks: Column): Column = {
    val contrib = (t: Column) =>
      transform(sequence(lit(0), lit(63)),
        b => when(call_function("shiftright", xxhash64(t), b).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
    val sums = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc, contrib(t), (x, y) => x + y))
    aggregate(
      zip_with(sums, sequence(lit(0), lit(63)),
        (v, b) => when(v > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x))
  }

  /** Near-dup pairs with SimHash Hamming distance <= maxDistance.
    * Blocking: split the sketch into `maxDistance + 1` chunks — by
    * pigeonhole any pair within the radius agrees on at least one whole
    * chunk, so candidates are found with equi-joins on (chunk index,
    * chunk value), never an all-pairs scan.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDistance: Int = 3): DataFrame = {
    val chunks = maxDistance + 1
    val bitsPerChunk = 64 / chunks
    val sk = df
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("sim", simhash(col("toks")))
    val chunked = sk.select(col(idCol), col("sim"),
      explode(transform(sequence(lit(0), lit(chunks - 1)),
        c => struct(c.as("chunk"),
          call_function("shiftright", col("sim"), c * lit(bitsPerChunk))
            .bitwiseAND(lit((1L << bitsPerChunk) - 1)).as("v")))).as("cc"))
      .select(col(idCol), col("sim"), col("cc.chunk"), col("cc.v"))
    val a = chunked.select(col("chunk"), col("v"), col(idCol).as("id_a"), col("sim").as("sim_a"))
    val b = chunked.select(col("chunk"), col("v"), col(idCol).as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("chunk", "v"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .filter(col("hamming") <= maxDistance)
      .groupBy("id_a", "id_b")
      .agg(first(col("hamming")).cast("long").as("hamming"))
  }

  // ------------------------------------------------- embedding near-dup

  /** Embedding-cosine near-duplicate pairs above a similarity threshold.
    * Quadratic ground truth (cast to double before any arithmetic so the
    * result is engine-portable); the scale path is SRP-LSH bucketing in
    * [[Similarity.srpCandidates]].
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val v = df.select(col(idCol), VectorOps.toDoubleVec(col(vecCol)).as("v"))
      .withColumn("nrm", VectorOps.l2Norm(col("v")))
    val a = v.select(col(idCol).as("id_a"), col("v").as("v_a"), col("nrm").as("nrm_a"))
    val b = v.select(col(idCol).as("id_b"), col("v").as("v_b"), col("nrm").as("nrm_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(VectorOps.dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
