package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, built from
  * higher-order array functions so it compiles into whole-stage codegen.
  *
  * Everything casts to double *before* arithmetic: float accumulation is
  * not associative enough to survive an engine hash-compare, and the
  * left-to-right `aggregate` fold gives a deterministic summation order.
  */
object VectorOps {

  def toDoubleVec(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product — the native codegen'd expression
    * ([[graft.functions.ArrayDotProduct]]); identical semantics and
    * summation order to [[dotComposable]], ~10× less per-pair overhead.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot(a, b)

  /** Left-to-right fold dot product from built-ins only — the reference
    * formulation `dot` is tested against, and the fallback for sessions
    * without graft function registration.
    */
  def dotComposable(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Brute-force top-k cosine neighbors of one query vector.
    *
    * The query vector is a literal, so the whole computation is a
    * map-only projection plus a global top-k (`orderBy.limit` →
    * TakeOrderedAndProject, which holds only k rows per partition and
    * merges k·p rows at the driver — safe at any scale).
    */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      roundTo: Int = 6): DataFrame = {
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val dv = toDoubleVec(col(vecCol))
    val sim = dot(dv, lit(query.toArray)) / (l2Norm(dv) * lit(qNorm))
    df.select(col(idCol), round(sim, roundTo).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Signed-random-projection bucket: the sign pattern of `planes`
    * pseudo-random hyperplane projections, packed into a long. Plane
    * coefficients are xxhash64-derived uniforms in [-0.5, 0.5) keyed by
    * (seedBase + plane, dimension) — fixed seeds, reproducible runs.
    * Native codegen'd expression ([[graft.functions.SrpBucket]]); the
    * composable form below defines the semantics and pins them in the
    * parity test.
    */
  def srpBucket(vec: Column, planes: Int, seedBase: Int = 0): Column =
    graft.functions.GraftFunctions.srp(vec, planes, seedBase)

  /** Built-ins-only formulation of [[srpBucket]] (reference semantics;
    * O(planes × dims) lambda steps per row — not the fast path).
    */
  def srpBucketComposable(vec: Column, planes: Int, seedBase: Int = 0): Column = {
    val signs = transform(sequence(lit(0), lit(planes - 1)), pIdx => {
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x * ((pmod(xxhash64(pIdx + lit(seedBase), i), lit(1000000L)).cast("double") / lit(1000000.0)) - lit(0.5))),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L)).otherwise(lit(0L))
    })
    aggregate(
      zip_with(signs, sequence(lit(0), lit(planes - 1)),
        (s, p) => call_function("shiftleft", s, p)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Symmetric int8 quantization of an embedding column: per-vector
    * scale = max(|x|)/127, elements round to [-127, 127]. 4× less
    * storage/shuffle than float32 — at 100 TB of embeddings that is the
    * difference between a broadcastable index and not. Emits
    * (scale: double, q: array<int>) columns; `dequantize` inverts.
    * Reconstruction error ≤ scale/2 per element; cosine drift is
    * bounded in the suite against exact.
    */
  def quantizeInt8(vec: Column): Column = {
    val dv = toDoubleVec(vec)
    val scale = aggregate(dv, lit(0.0), (acc, x) => greatest(acc, abs(x))) / lit(127.0)
    struct(
      scale.as("scale"),
      transform(dv, x =>
        when(scale === 0, lit(0)).otherwise(round(x / scale, 0)).cast("int")).as("q"))
  }

  def dequantize(quantized: Column): Column =
    transform(quantized.getField("q"),
      q => q.cast("double") * quantized.getField("scale"))

  /** ANN top-k via IVF (inverted-file) coarse quantization: vectors are
    * assigned to their nearest of `nCentroids` coarse centroids (a
    * map-only argmax), and a query scans only its `nProbe` nearest
    * centroid lists. Centroids here are the first `nCentroids` corpus
    * vectors by id — deterministic and cheap; production would run
    * k-means and persist the assignment as a partition column, making
    * the probe a partition-pruned scan.
    */
  def ivfTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val cents: Array[(Int, Array[Double], Double)] = df
      .orderBy(col(idCol)).limit(nCentroids)
      .select(toDoubleVec(col(vecCol)).as("v")).collect()
      .zipWithIndex
      .map { case (r, i) =>
        val v = r.getSeq[Double](0).toArray
        (i, v, math.sqrt(v.map(x => x * x).sum))
      }
    def centroidSims(vec: Column, norm: Column): Seq[(Column, Int)] =
      cents.toSeq.map { case (i, cv, cn) =>
        (dot(vec, lit(cv)) / (norm * lit(cn)), i)
      }
    // argmax via greatest over (sim, idx) structs — lexicographic, ties
    // resolved toward the higher index, deterministically. greatest()
    // needs >= 2 args; a single-centroid index is the trivial assignment.
    def nearestCentroid(vec: Column, norm: Column): Column = {
      val structs = centroidSims(vec, norm).map { case (s, i) =>
        struct(s.as("sim"), lit(i).as("idx"))
      }
      if (structs.size == 1) lit(0) else greatest(structs: _*).getField("idx")
    }
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val probes = cents
      .map { case (i, cv, cn) =>
        (i, cv.zip(query).map { case (a, b) => a * b }.sum / (cn * qNorm))
      }
      .sortBy { case (i, s) => (-s, i) }.take(nProbe).map(_._1).toSeq
    val v = df
      .withColumn("dv", toDoubleVec(col(vecCol)))
      .withColumn("nrm", l2Norm(col("dv")))
      .withColumn("cluster", nearestCentroid(col("dv"), col("nrm")))
    v.filter(col("cluster").isin(probes: _*))
      .select(col(idCol),
        round(dot(col("dv"), lit(query.toArray)) / (col("nrm") * lit(qNorm)), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** ANN top-k via SRP-LSH: score only vectors sharing the query's
    * bucket in at least one of `tables` independent hash tables.
    * Approximate — recall is tested against [[bruteForceTopK]] in the
    * suite; at 100 TB the candidate set per query is a few buckets
    * instead of the full corpus, and the bucket columns can be
    * precomputed and partitioned-by for repeated query workloads.
    */
  def srpTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      planes: Int = 8,
      tables: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.withColumn("dv", toDoubleVec(col(vecCol)))
    val withBuckets = (0 until tables).foldLeft(v) { (d, t) =>
      d.withColumn(s"b$t", srpBucket(col("dv"), planes, t * planes))
    }
    // The query's buckets come from running the identical expression on a
    // one-row frame — same codegen path, so corpus and query agree bit-for-bit.
    val qRow = (0 until tables).foldLeft(Seq(Tuple1(query.toArray)).toDF("qv")) {
      (d, t) => d.withColumn(s"b$t", srpBucket(col("qv"), planes, t * planes))
    }.select((0 until tables).map(t => col(s"b$t")): _*).head()
    // Multi-probe: accept buckets within Hamming distance 1 of the
    // query's bucket in any table — near neighbors that land one
    // hyperplane-sign away (the dominant miss mode for SRP) are
    // recovered at ~(planes+1)× candidate cost, still sublinear.
    val cand = (0 until tables)
      .map(t => bit_count(col(s"b$t").bitwiseXOR(lit(qRow.getLong(t)))) <= 1)
      .reduce(_ || _)
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    withBuckets.filter(cand)
      .select(col(idCol),
        round(dot(col("dv"), lit(query.toArray)) / (l2Norm(col("dv")) * lit(qNorm)), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
