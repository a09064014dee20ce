package graft.streaming

import graft.ops.{Dedup, TextFunctions}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One emitted near-duplicate pair: ids ordered `id_a < id_b`,
  * `est_jaccard` = fraction of agreeing MinHash components (the
  * unbiased Jaccard estimator), rounded to 6 digits HALF_UP to match
  * the batch relation's `round(..., 6)`.
  */
final case class NearDupPair(id_a: Long, id_b: Long, est_jaccard: Double)

/** One retained document in a bucket's state. */
final case class SigEntry(id: Long, sig: Array[Long])

/** Per-(band, bucket) LSH state: the retained signatures plus the
  * saturation latch (see [[DedupStream.nearDupPairs]]'s cap contract).
  */
final case class BucketState(entries: List[SigEntry], saturated: Boolean)

/** Streaming near-duplicate detection — the streaming twin of
  * [[graft.ops.Dedup.minhashEstPairs]]: documents arrive on a stream,
  * MinHash signatures are computed map-side (same native
  * `graft_minhash` expression as the batch path), banded LSH keys
  * shard the corpus into buckets, and `flatMapGroupsWithState` keyed
  * by (band, bucket) compares each arriving signature against the
  * bucket's retained signatures — emitting a pair the moment the
  * later document arrives, instead of re-scanning the corpus per
  * batch.
  *
  * Scale shape: state is exactly the LSH bucket index — numHashes
  * longs per document per band — sharded across executors by bucket
  * key and bounded per key by `maxBucket`, so no single degenerate
  * bucket (the empty-ish document class) can accumulate unbounded
  * state or quadratic compare work. Total state grows with the corpus
  * like the batch index does; a retention window (state TTL) is the
  * production knob for unbounded streams and composes orthogonally.
  */
object DedupStream {

  private[streaming] def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Near-dup pairs over a STREAMING documents relation.
    *
    * Contract vs the batch twin ([[Dedup.minhashEstPairs]], same
    * params): on any corpus where no (band, bucket) collects more
    * than `maxBucket` documents, the DISTINCT emitted pair set equals
    * the batch relation exactly (same signatures, same estimator,
    * same rounding; a pair is emitted once per agreeing band, so
    * consumers `distinct` — exactly as the batch path dedups its
    * multi-band candidates). Saturation semantics necessarily differ:
    * the batch guard drops an oversized bucket RETROACTIVELY (rank
    * prune + size filter), while a stream cannot unemit — here a
    * bucket that reaches `maxBucket` entries latches `saturated` and
    * drops every later arrival (no compares, no state growth), so an
    * adversarial hot bucket stops costing anything the moment it
    * saturates.
    *
    * Redelivery: an id already present in the bucket's state is
    * skipped wholesale (no compares, no re-emission, no state
    * change), so at-least-once sources redeliver batches for free.
    * Within a micro-batch, arrivals are processed in id order for a
    * deterministic pair orientation; `id_a < id_b` always.
    */
  def nearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      sigThreshold: Double = 0.5,
      maxBucket: Int = 1000): Dataset[NearDupPair] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = docs.sparkSession
    import spark.implicits._
    val r = numHashes / bands
    val sigs = docs
      .select(col(idCol).cast("long").as("id"),
        TextFunctions.shingleSet(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), Dedup.minhashSignature(col("sh"), numHashes).as("sig"))
    val banded = sigs
      .select(col("id"), col("sig"),
        explode(Dedup.lshBands(col("sig"), bands, r)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        col("id"), col("sig"))
      .as[(Int, Long, Long, Array[Long])]
    banded
      .groupByKey { case (band, bucket, _, _) => (band, bucket) }
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[BucketState]) =>
          val st = state.getOption.getOrElse(BucketState(Nil, saturated = false))
          var entries = st.entries
          var saturated = st.saturated
          val out = List.newBuilder[NearDupPair]
          // id order within the batch = deterministic emission
          val arrivals = rows.map { case (_, _, id, sig) => SigEntry(id, sig) }
            .toArray.sortBy(_.id)
          for (e <- arrivals) {
            if (!saturated && !entries.exists(_.id == e.id)) {
              for (seen <- entries) {
                var m = 0
                var i = 0
                while (i < numHashes) {
                  if (e.sig(i) == seen.sig(i)) m += 1
                  i += 1
                }
                // filter on the ROUNDED estimate, as the batch twin does
                // (k/numHashes can repeat in decimal for non-power-of-2
                // numHashes — the threshold must see the same value)
                val est = round6(m.toDouble / numHashes)
                if (est >= sigThreshold)
                  out += NearDupPair(
                    math.min(e.id, seen.id), math.max(e.id, seen.id), est)
              }
              entries = e :: entries
              if (entries.size >= maxBucket) saturated = true
            }
          }
          state.update(BucketState(entries, saturated))
          out.result().iterator
      }
  }
}
