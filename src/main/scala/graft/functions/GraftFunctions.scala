package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Registration + Column front ends for graft's native expressions.
  *
  * Registered through the session FunctionRegistry (Sessions.local does
  * this automatically) so both the SQL surface (`graft_dot(a, b)`) and
  * the Column API work; resolution happens at analysis time, which keeps
  * these inside whole-stage codegen.
  */
object GraftFunctions {

  val DotName = "graft_dot"
  val SimHashName = "graft_simhash"
  val MinHashName = "graft_minhash"
  val ShinglesName = "graft_shingles"
  val SrpName = "graft_srp"
  val SrpProbesName = "graft_srp_probes"
  val VecSumName = "graft_vec_sum"
  val MgTopKName = "graft_mg_topk"
  val BloomName = "graft_bloom_contains"
  val NearestCentroidName = "graft_nearest_centroid"
  val NearestCentroidsName = "graft_nearest_centroids"
  val NearestCentroidsHierName = "graft_nearest_centroids_hier"
  val PqCodesName = "graft_pq_codes"
  val PqAdcName = "graft_pq_adc"
  val PqLutName = "graft_pq_lut"
  val PqAdcPairName = "graft_pq_adc_pair"
  val BpeEncodeName = "graft_bpe_encode"
  val UnigramEncodeName = "graft_unigram_encode"
  val RollingHashesName = "graft_rolling_hashes"
  val WinnowName = "graft_winnow"
  val NormalizeName = "graft_normalize"
  val SignPackName = "graft_sign_pack"
  val HammingName = "graft_hamming"
  val TextStatsName = "graft_text_stats"
  val KllAggName = "graft_kll_agg"
  val KllUnionAggName = "graft_kll_union_agg"
  val KllQuantilesName = "graft_kll_quantiles"
  val KllRankName = "graft_kll_rank"

  /** Extract a required integer-literal argument with a diagnosable
    * error (a bare eval() on a non-foldable expression would surface as
    * an opaque Catalyst UnsupportedOperationException).
    */
  private[graft] def literalInt(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String, argName: String): Int = {
    require(e.foldable, s"$fn: $argName must be an integer literal, got ${e.sql}")
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $argName must be an integer literal, got $other")
    }
  }

  /** Extract a required double-literal argument (same diagnosis
    * rationale as [[literalInt]]).
    */
  private[graft] def literalDouble(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String, argName: String): Double = {
    require(e.foldable, s"$fn: $argName must be a double literal, got ${e.sql}")
    e.eval() match {
      case n: Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $argName must be a double literal, got $other")
    }
  }

  /** Extract a required array<double>-literal argument (same diagnosis
    * rationale as [[literalInt]]).
    */
  private[graft] def literalDoubleArray(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String, argName: String): Array[Double] = {
    require(e.foldable, s"$fn: $argName must be an array<double> literal, got ${e.sql}")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData => a.toDoubleArray()
      case other => throw new IllegalArgumentException(
        s"$fn: $argName must be an array<double> literal, got $other")
    }
  }

  /** Extract a required array<string>-literal argument (same diagnosis
    * rationale as [[literalInt]]).
    */
  private[graft] def literalStringArray(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String, argName: String): Array[String] = {
    require(e.foldable, s"$fn: $argName must be an array<string> literal, got ${e.sql}")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        a.toArray[org.apache.spark.unsafe.types.UTF8String](
            org.apache.spark.sql.types.StringType)
          .map(s => if (s == null) null else s.toString)
      case other => throw new IllegalArgumentException(
        s"$fn: $argName must be an array<string> literal, got $other")
    }
  }

  /** Shared builder for `graft_nearest_centroid(vec, norm, centsFlat,
    * dim)` — the centroid matrix is consumed at ANALYSIS time (it must
    * be a literal) and embedded in the expression as one flat double[]
    * reference object, with per-centroid norms precomputed here.
    */
  private[graft] def buildNearestCentroid(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    val flat = literalDoubleArray(exprs(2), NearestCentroidName, "centsFlat")
    val dim = literalInt(exprs(3), NearestCentroidName, "dim")
    require(dim >= 1 && flat.nonEmpty && flat.length % dim == 0,
      s"$NearestCentroidName: centsFlat length ${flat.length} is not a " +
        s"positive multiple of dim $dim")
    val norms = centroidNorms(flat, dim, NearestCentroidName)
    NearestCentroid(exprs.head, exprs(1), flat, norms, dim)
  }

  /** Per-centroid L2 norms, validated finite and > 0. A zero-norm (or
    * non-finite) centroid makes every cosine against it NaN, and NaN
    * orders ABOVE every real similarity under `Double.compare` — the
    * top-n insert loops would rank the malformed centroid FIRST in
    * every probe list while the scalar argmax never selects it. Builder
    * tables from `kmeansCentroids` can't contain one (a mean of
    * unit-ish vectors), so this is a construction-time contract check,
    * not a per-row cost.
    */
  private def centroidNorms(flat: Array[Double], dim: Int, fn: String): Array[Double] = {
    val norms = flat.grouped(dim).map(cv => math.sqrt(cv.map(x => x * x).sum)).toArray
    val bad = norms.indexWhere(n => !(n > 0) || n.isInfinite)
    require(bad < 0,
      s"$fn: centroid $bad has L2 norm ${if (bad >= 0) norms(bad) else 0.0} — " +
        "every centroid must have a finite positive norm (cosine against it " +
        "would be NaN and would corrupt the probe-list ordering)")
    norms
  }

  /** Extract a required array<int>-literal argument (same diagnosis
    * rationale as [[literalInt]]).
    */
  private[graft] def literalIntArray(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String, argName: String): Array[Int] = {
    require(e.foldable, s"$fn: $argName must be an array<int> literal, got ${e.sql}")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData => a.toIntArray()
      case other => throw new IllegalArgumentException(
        s"$fn: $argName must be an array<int> literal, got $other")
    }
  }

  /** Builder for `graft_nearest_centroids(vec, norm, centsFlat, dim, n)`
    * — the top-n probe-list variant (same literal-consumption contract
    * as [[buildNearestCentroid]]).
    */
  private[graft] def buildNearestCentroids(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    val flat = literalDoubleArray(exprs(2), NearestCentroidsName, "centsFlat")
    val dim = literalInt(exprs(3), NearestCentroidsName, "dim")
    val n = literalInt(exprs(4), NearestCentroidsName, "n")
    require(dim >= 1 && flat.nonEmpty && flat.length % dim == 0,
      s"$NearestCentroidsName: centsFlat length ${flat.length} is not a " +
        s"positive multiple of dim $dim")
    require(n >= 1, s"$NearestCentroidsName: n=$n must be >= 1")
    val norms = centroidNorms(flat, dim, NearestCentroidsName)
    NearestCentroids(exprs.head, exprs(1), flat, norms, dim, n)
  }

  /** Builder for `graft_nearest_centroids_hier(vec, norm, centsFlat,
    * dim, n, coarseFlat, memberStart, members, coarseProbes)` — the
    * two-level probe-list variant; both centroid matrices and the CSR
    * grouping are consumed at analysis time.
    */
  private[graft] def buildNearestCentroidsHier(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    val fn = NearestCentroidsHierName
    val flat = literalDoubleArray(exprs(2), fn, "centsFlat")
    val dim = literalInt(exprs(3), fn, "dim")
    val n = literalInt(exprs(4), fn, "n")
    val coarseFlat = literalDoubleArray(exprs(5), fn, "coarseFlat")
    val memberStart = literalIntArray(exprs(6), fn, "memberStart")
    val members = literalIntArray(exprs(7), fn, "members")
    val coarseProbes = literalInt(exprs(8), fn, "coarseProbes")
    require(dim >= 1 && flat.nonEmpty && flat.length % dim == 0,
      s"$fn: centsFlat length ${flat.length} is not a positive multiple of dim $dim")
    require(coarseFlat.nonEmpty && coarseFlat.length % dim == 0,
      s"$fn: coarseFlat length ${coarseFlat.length} is not a positive multiple of dim $dim")
    require(n >= 1, s"$fn: n=$n must be >= 1")
    require(coarseProbes >= 1, s"$fn: coarseProbes=$coarseProbes must be >= 1")
    val norms = centroidNorms(flat, dim, fn)
    val coarseNorms = centroidNorms(coarseFlat, dim, fn + " (coarse)")
    NearestCentroidsHier(exprs.head, exprs(1), flat, norms, dim, n,
      coarseFlat, coarseNorms, memberStart, members, coarseProbes)
  }

  /** Arity check with the function name in the message — a bare
    * exprs(i) on a short list would surface as an opaque
    * IndexOutOfBoundsException at analysis time.
    */
  private[graft] def arity(
      fn: String, n: Int)(
      build: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression =
    exprs => {
      require(exprs.length == n,
        s"$fn expects $n arguments, got ${exprs.length}")
      build(exprs)
    }

  /** Single source of truth for every native function: (name, arity,
    * builder). BOTH registration paths — the per-session
    * [[register]] that [[graft.Sessions.local]] calls and the
    * cluster-wide [[graft.GraftExtensions]] `spark.sql.extensions`
    * path — iterate THIS table, so they can never drift again
    * (round 11 found the extensions path six functions behind the
    * session path; the "must register the same set" contract was
    * comment-only).
    */
  import org.apache.spark.sql.catalyst.expressions.Expression

  def builders: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    (DotName, 2, exprs => ArrayDotProduct(exprs.head, exprs(1))),
    (SimHashName, 1, exprs => SimHash64(exprs.head)),
    (MinHashName, 2, exprs => MinHashSignature(exprs.head,
      literalInt(exprs(1), MinHashName, "numHashes"))),
    (ShinglesName, 2, exprs => WordShingles(exprs.head,
      literalInt(exprs(1), ShinglesName, "n"))),
    (NormalizeName, 1, exprs => NormalizeText(exprs.head)),
    (SignPackName, 1, exprs => SignPack(exprs.head)),
    (HammingName, 2, exprs => HammingDistance(exprs.head, exprs(1))),
    (TextStatsName, 1, exprs => TextStats(exprs.head)),
    (RollingHashesName, 2, exprs => RollingWindowHashes(exprs.head,
      literalInt(exprs(1), RollingHashesName, "width"))),
    (WinnowName, 3, exprs => WinnowFingerprints(exprs.head,
      literalInt(exprs(1), WinnowName, "k"),
      literalInt(exprs(2), WinnowName, "window"))),
    (SrpName, 3, exprs => SrpBucket(exprs.head,
      literalInt(exprs(1), SrpName, "planes"),
      literalInt(exprs(2), SrpName, "seedBase"))),
    (SrpProbesName, 4, exprs => SrpProbeBuckets(exprs.head,
      literalInt(exprs(1), SrpProbesName, "planes"),
      literalInt(exprs(2), SrpProbesName, "seedBase"),
      literalInt(exprs(3), SrpProbesName, "probes"))),
    // aggregates return the raw AggregateFunction — the analyzer wraps
    // it in an AggregateExpression (pre-wrapping breaks DISTINCT)
    (VecSumName, 1, exprs => VectorSum(exprs.head)),
    (KllAggName, 2, exprs => KllSketchAgg(exprs.head,
      literalInt(exprs(1), KllAggName, "k"))),
    (KllUnionAggName, 2, exprs => KllUnionAgg(exprs.head,
      literalInt(exprs(1), KllUnionAggName, "k"))),
    (KllQuantilesName, 2, exprs => KllQuantiles(exprs.head, exprs(1))),
    (KllRankName, 2, exprs => KllRank(exprs.head, exprs(1))),
    (MgTopKName, 2, exprs => MisraGriesTopK(exprs.head,
      literalInt(exprs(1), MgTopKName, "capacity"))),
    // Spark's own runtime-filter probe expression (codegen'd, lazily
    // deserializes the sketch once per task) — registered so the Column
    // API can build it against a driver-built sketch literal. Spark only
    // wires it up internally (InjectRuntimeFilter); the expression itself
    // is public API surface in catalyst.
    (BloomName, 2, exprs =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs.head, exprs(1))),
    (NearestCentroidName, 4, buildNearestCentroid),
    (NearestCentroidsName, 5, buildNearestCentroids),
    (NearestCentroidsHierName, 9, buildNearestCentroidsHier),
    (PqCodesName, 4, exprs => {
      val flat = literalDoubleArray(exprs(1), PqCodesName, "flatCodebook")
      val m = literalInt(exprs(2), PqCodesName, "m")
      val subDim = literalInt(exprs(3), PqCodesName, "subDim")
      require(m >= 1 && subDim >= 1 && flat.nonEmpty &&
        flat.length % (m * subDim) == 0,
        s"$PqCodesName: flat length ${flat.length} is not a positive " +
          s"multiple of m*subDim = ${m * subDim}")
      PqCodes(exprs.head, flat, m, flat.length / (m * subDim), subDim)
    }),
    (PqAdcName, 3, exprs => {
      val lut = literalDoubleArray(exprs(1), PqAdcName, "flatLut")
      val m = literalInt(exprs(2), PqAdcName, "m")
      require(m >= 1 && lut.nonEmpty && lut.length % m == 0,
        s"$PqAdcName: LUT length ${lut.length} is not a positive multiple of m=$m")
      PqAdc(exprs.head, lut, m, lut.length / m)
    }),
    (PqLutName, 4, exprs => {
      val flat = literalDoubleArray(exprs(1), PqLutName, "flatCodebook")
      val m = literalInt(exprs(2), PqLutName, "m")
      val subDim = literalInt(exprs(3), PqLutName, "subDim")
      require(m >= 1 && subDim >= 1 && flat.nonEmpty &&
        flat.length % (m * subDim) == 0,
        s"$PqLutName: flat length ${flat.length} is not a positive " +
          s"multiple of m*subDim = ${m * subDim}")
      PqLut(exprs.head, flat, m, flat.length / (m * subDim), subDim)
    }),
    (PqAdcPairName, 4, exprs => PqAdcPair(exprs.head, exprs(1),
      literalInt(exprs(2), PqAdcPairName, "m"),
      literalInt(exprs(3), PqAdcPairName, "k"))),
    (BpeEncodeName, 3, exprs => {
      val lefts = literalStringArray(exprs(1), BpeEncodeName, "lefts")
      val rights = literalStringArray(exprs(2), BpeEncodeName, "rights")
      require(lefts.length == rights.length,
        s"$BpeEncodeName: ${lefts.length} left vs ${rights.length} right symbols")
      BpeEncode(exprs.head, lefts, rights)
    }),
    (UnigramEncodeName, 4, exprs => {
      val pieces = literalStringArray(exprs(1), UnigramEncodeName, "pieces")
      val scores = literalDoubleArray(exprs(2), UnigramEncodeName, "scores")
      val unk = literalDouble(exprs(3), UnigramEncodeName, "unkScore")
      require(pieces.length == scores.length,
        s"$UnigramEncodeName: ${pieces.length} pieces vs ${scores.length} scores")
      UnigramEncode(exprs.head, pieces, scores, unk)
    }))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, n, build) =>
      reg.createOrReplaceTempFunction(name, arity(name, n)(build), "built-in")
    }
  }

  /** Native dot product (requires `register(spark)` — done by
    * [[graft.Sessions.local]]).
    */
  def dot(a: Column, b: Column): Column = call_function(DotName, a, b)

  /** Native ASCII dedup-key normalization (requires `register(spark)`). */
  def normalize(t: Column): Column = call_function(NormalizeName, t)

  /** Native sign-bit binary quantization: `array<float|double>` →
    * bit-packed `array<long>` (requires `register(spark)`).
    */
  def signPack(vec: Column): Column = call_function(SignPackName, vec)

  /** Native Hamming distance over two [[signPack]]-packed codes
    * (requires `register(spark)`).
    */
  def hamming(a: Column, b: Column): Column = call_function(HammingName, a, b)

  /** Native one-pass text quality stats `[n_chars, n_tok, stop_hits,
    * punct]` (requires `register(spark)`).
    */
  def textStats(t: Column): Column = call_function(TextStatsName, t)

  /** Native PQ encode: raw vector → per-subspace argmin codes against a
    * fixed flat [subspace][centroid][component] codebook (requires
    * `register(spark)`).
    */
  def pqCodes(vec: Column, flatCodebook: Array[Double], m: Int, subDim: Int): Column =
    call_function(PqCodesName, vec,
      org.apache.spark.sql.functions.lit(flatCodebook),
      org.apache.spark.sql.functions.lit(m),
      org.apache.spark.sql.functions.lit(subDim))

  /** Native ADC scoring of a codes column against a per-query flat
    * [subspace][centroid] LUT (requires `register(spark)`).
    */
  def pqAdc(codes: Column, flatLut: Array[Double], m: Int): Column =
    call_function(PqAdcName, codes,
      org.apache.spark.sql.functions.lit(flatLut),
      org.apache.spark.sql.functions.lit(m))

  /** Native per-row ADC-LUT construction: a raw query-vector column →
    * its flat [subspace][centroid] LUT against a fixed codebook — the
    * per-query half of batch IVF-PQ retrieval (requires
    * `register(spark)`).
    */
  def pqLut(vec: Column, flatCodebook: Array[Double], m: Int, subDim: Int): Column =
    call_function(PqLutName, vec,
      org.apache.spark.sql.functions.lit(flatCodebook),
      org.apache.spark.sql.functions.lit(m),
      org.apache.spark.sql.functions.lit(subDim))

  /** Native ADC scoring of a codes column against a per-row LUT column
    * (requires `register(spark)`).
    */
  def pqAdcPair(codes: Column, lut: Column, m: Int, k: Int): Column =
    call_function(PqAdcPairName, codes, lut,
      org.apache.spark.sql.functions.lit(m),
      org.apache.spark.sql.functions.lit(k))

  /** Native BPE subword encode of a token array under a fixed
    * rank-ordered merge table (requires `register(spark)`).
    */
  def bpeEncode(words: Column, lefts: Array[String], rights: Array[String]): Column =
    call_function(BpeEncodeName, words,
      org.apache.spark.sql.functions.lit(lefts),
      org.apache.spark.sql.functions.lit(rights))

  /** Native unigram-LM Viterbi encode of a token array under a fixed
    * (piece, score) vocabulary (requires `register(spark)`).
    */
  def unigramEncode(
      words: Column,
      pieces: Array[String],
      scores: Array[Double],
      unkScore: Double): Column =
    call_function(UnigramEncodeName, words,
      org.apache.spark.sql.functions.lit(pieces),
      org.apache.spark.sql.functions.lit(scores),
      org.apache.spark.sql.functions.lit(unkScore))

  /** Native nearest-centroid assignment against a fixed centroid table
    * (requires `register(spark)` — done by [[graft.Sessions.local]]).
    */
  def nearestCentroid(vec: Column, norm: Column, cents: Array[Array[Double]]): Column = {
    require(cents.nonEmpty, s"$NearestCentroidName: empty centroid table")
    call_function(NearestCentroidName, vec, norm,
      org.apache.spark.sql.functions.lit(cents.flatten),
      org.apache.spark.sql.functions.lit(cents.head.length))
  }

  /** Native top-n nearest centroids (probe list per row) against a fixed
    * centroid table (requires `register(spark)`).
    */
  def nearestCentroids(
      vec: Column, norm: Column, cents: Array[Array[Double]], n: Int): Column = {
    require(cents.nonEmpty, s"$NearestCentroidsName: empty centroid table")
    call_function(NearestCentroidsName, vec, norm,
      org.apache.spark.sql.functions.lit(cents.flatten),
      org.apache.spark.sql.functions.lit(cents.head.length),
      org.apache.spark.sql.functions.lit(n))
  }

  /** Native hierarchical top-n nearest centroids: rank only the fine
    * centroids grouped under the `coarseProbes` nearest coarse
    * centroids (requires `register(spark)`). `memberStart`/`members`
    * is the CSR fine→coarse grouping, `VectorOps.coarseGrouping`
    * builds all three driver-side.
    */
  def nearestCentroidsHier(
      vec: Column, norm: Column, cents: Array[Array[Double]], n: Int,
      coarse: Array[Array[Double]], memberStart: Array[Int],
      members: Array[Int], coarseProbes: Int): Column = {
    require(cents.nonEmpty && coarse.nonEmpty,
      s"$NearestCentroidsHierName: empty centroid table")
    call_function(NearestCentroidsHierName, vec, norm,
      org.apache.spark.sql.functions.lit(cents.flatten),
      org.apache.spark.sql.functions.lit(cents.head.length),
      org.apache.spark.sql.functions.lit(n),
      org.apache.spark.sql.functions.lit(coarse.flatten),
      org.apache.spark.sql.functions.lit(memberStart),
      org.apache.spark.sql.functions.lit(members),
      org.apache.spark.sql.functions.lit(coarseProbes))
  }

  /** Native 64-bit SimHash of an array<string> token column. */
  def simhash(toks: Column): Column = call_function(SimHashName, toks)

  /** Native MinHash signature (array<long> of `numHashes` mins). */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    call_function(MinHashName, shingles, org.apache.spark.sql.functions.lit(numHashes))

  /** Native distinct word n-gram shingles of a token array. */
  def shingles(toks: Column, n: Int): Column =
    call_function(ShinglesName, toks, org.apache.spark.sql.functions.lit(n))

  /** Native positional rolling window hashes (array<long>, one per
    * window start) of a token array.
    */
  def rollingWindowHashes(toks: Column, width: Int): Column =
    call_function(RollingHashesName, toks, org.apache.spark.sql.functions.lit(width))

  /** Native winnowing fingerprints (array<struct<pos, fp>>) of a token
    * array — see [[WinnowFingerprints]].
    */
  def winnow(toks: Column, k: Int, window: Int): Column =
    call_function(WinnowName, toks,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(window))

  /** Native SRP bucket (sign pattern of `planes` projections, packed). */
  def srp(vec: Column, planes: Int, seedBase: Int): Column =
    call_function(SrpName, vec,
      org.apache.spark.sql.functions.lit(planes),
      org.apache.spark.sql.functions.lit(seedBase))

  /** Native query-directed probe posting set: exact SRP bucket plus the
    * `probes` lowest-margin Hamming-1 neighbor buckets (array<long>).
    */
  def srpProbes(vec: Column, planes: Int, seedBase: Int, probes: Int): Column =
    call_function(SrpProbesName, vec,
      org.apache.spark.sql.functions.lit(planes),
      org.apache.spark.sql.functions.lit(seedBase),
      org.apache.spark.sql.functions.lit(probes))

  /** Native element-wise array<double> SUM aggregate (one hash agg with
    * map-side partials — no posexplode dimension blow-up).
    */
  def vecSum(vec: Column): Column = call_function(VecSumName, vec)

  /** KLL quantile-sketch aggregate: double column → compact binary
    * state (mergeable; rank error ≤ ~1.65% at the default k=200).
    */
  def kllAgg(value: Column, k: Int = 200): Column =
    call_function(KllAggName, value, org.apache.spark.sql.functions.lit(k))

  /** Union of serialized KLL states (rollup-on-read). */
  def kllUnionAgg(sketch: Column, k: Int = 200): Column =
    call_function(KllUnionAggName, sketch, org.apache.spark.sql.functions.lit(k))

  /** Estimated quantiles at the given normalized ranks; null for an
    * empty sketch.
    */
  def kllQuantiles(sketch: Column, qs: Seq[Double]): Column =
    call_function(KllQuantilesName, sketch,
      org.apache.spark.sql.functions.lit(qs.toArray))

  /** Estimated normalized rank of a value; null for an empty sketch. */
  def kllRank(sketch: Column, value: Column): Column =
    call_function(KllRankName, sketch, value)

  /** Native Misra–Gries frequent-items summary (mergeable; every item
    * with count > N/(capacity+1) is guaranteed present).
    */
  def mgTopK(item: Column, capacity: Int): Column =
    call_function(MgTopKName, item, org.apache.spark.sql.functions.lit(capacity))

  /** Probe a serialized `org.apache.spark.util.sketch.BloomFilter`
    * (e.g. from `df.stat.bloomFilter`) against a LongType column.
    * false ⇒ definitely absent; true ⇒ present OR a false positive at
    * the sketch's configured fpp. Codegen'd — the sketch deserializes
    * once per task, not per row.
    */
  def bloomContains(serializedBloom: Array[Byte], value: Column): Column =
    call_function(BloomName,
      org.apache.spark.sql.functions.lit(serializedBloom), value)
}
