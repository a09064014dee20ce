package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: group documents into fixed-token-budget bins
  * (training batches / context windows) so short documents share a
  * sequence instead of wasting pad tokens.
  *
  * Algorithm: next-fit greedy per partition — docs are HASH-partitioned
  * on id and sorted by id within each partition, then a single forward
  * pass opens a new bin whenever the next doc would overflow the
  * budget. Packing never crosses partitions, so the pass is
  * embarrassingly parallel and one doc's bin is decided by O(1) state.
  * Hash partitioning (murmur3 of the id value) is chosen over
  * repartitionByRange deliberately: range boundaries come from a
  * reservoir SAMPLE seeded per-run, so they jitter between executions
  * on corpora larger than the sample — hash placement is a pure
  * function of (id, partitions), making bin assignments reproducible
  * run to run and independent of input file layout.
  * A doc longer than the budget gets a bin of its own (callers truncate
  * or split upstream; silently dropping data is not this operator's
  * call). Fill loss vs bin-optimal is bounded per bin boundary by the
  * largest doc and measured in PackingSpec; at 100 TB the win over
  * optimal packing is irrelevant next to never shuffling doc text —
  * only (id, n_tokens) pairs move.
  */
object Packing {

  private def assertNotNull(c: org.apache.spark.sql.Column, name: String) =
    when(c.isNull, raise_error(lit(
      s"packGreedy: NULL or uncastable `$name` value — filter or repair ids/token counts upstream"
    ))).otherwise(c)

  def packGreedy(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      partitions: Int = 32): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // Fail readably: a NULL id/token (or an uncastable string — cast
    // yields NULL) would otherwise NPE inside the primitive-Long encoder
    // as an opaque executor-side codegen failure.
    df.select(col(idCol).cast("long").as(idCol), col(tokenCol).cast("long").as(tokenCol))
      .select(
        assertNotNull(col(idCol), idCol).as(idCol),
        assertNotNull(col(tokenCol), tokenCol).as(tokenCol))
      .as[(Long, Long)]
      .repartition(partitions, col(idCol))
      .sortWithinPartitions(idCol)
      .mapPartitions { iter =>
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        var bin = 0L
        var fill = 0L
        iter.map { case (id, tok) =>
          if (fill > 0 && fill + tok > budget) { bin += 1; fill = 0L }
          fill += tok
          (id, (pid << 32) | bin, tok)
        }
      }
      .toDF(idCol, "bin_id", "n_tokens")
  }

  /** Concat-and-chunk packing (the GPT/T5 pretraining layout): all
    * documents concatenate in `idCol` order into one global token
    * stream cut into fixed `blockSize` blocks, docs crossing block
    * boundaries — the zero-padding-waste alternative to
    * [[packGreedy]]'s boundary-respecting bins. Returns the block
    * membership relation `(block_id, doc_id, n_tokens)`: how many of
    * the doc's tokens land in each block it spans.
    *
    * Scale shape: one map-only token count, the two-phase
    * [[Sampling.prefixSum]] for each doc's global start offset (never
    * a single-reducer global window), then a map-only explode over the
    * blocks a doc spans — bounded per doc by len/blockSize + 1, so the
    * output is |docs| + |tokens|/blockSize rows. Exact integer
    * arithmetic end to end (SQL-replayable). Empty docs occupy no
    * block and emit no row.
    */
  def concatChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockSize: Int): DataFrame = {
    require(blockSize >= 1, s"blockSize=$blockSize must be >= 1")
    val counted = df.select(col(idCol),
      size(array_remove(TextFunctions.tokens(col(textCol)), ""))
        .cast("long").as("n"))
    val b = lit(blockSize.toLong)
    Sampling.prefixSum(counted, idCol, "n")
      .filter(col("n") > 0)
      .select(col(idCol), col("n"), col("cum_sum").as("s"),
        (col("cum_sum") + col("n") - 1).as("e"))
      .select(col(idCol), col("s"), col("e"),
        explode(sequence(expr(s"s div ${blockSize}L"),
          expr(s"e div ${blockSize}L"))).as("block_id"))
      .select(col("block_id"), col(idCol),
        (least(col("e"), (col("block_id") + 1) * b - 1) -
          greatest(col("s"), col("block_id") * b) + 1).cast("long")
          .as("n_tokens"))
  }

  /** [[concatChunks]] with the CONTENT: each fixed-size block carries
    * its actual token sequence plus the 0-based in-block positions
    * where a new document starts — exactly what a decoder-style
    * pretraining loader needs to build the block text and its
    * cross-document attention-mask boundaries. Output:
    * `(block_id, seq, n_tokens, n_docs, boundaries)` where `boundaries`
    * is the comma-joined doc-start positions ("" when the block only
    * continues an earlier document).
    *
    * Scale shape: [[Sampling.prefixSum]] for each doc's global offset,
    * a map-only token posexplode (global position = offset + pos,
    * block = div, in-block = mod), then ONE partial-aggregated
    * assembly per block ([[Features.eventSequences]]'s contract —
    * per-group payload is exactly one training block). No window at
    * all: in-block order is arithmetic, not rank.
    */
  def concatChunkBlocks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockSize: Int): DataFrame = {
    require(blockSize >= 1, s"blockSize=$blockSize must be >= 1")
    val counted = df.select(col(idCol), col(textCol),
      size(array_remove(TextFunctions.tokens(col(textCol)), ""))
        .cast("long").as("n"))
    val b = lit(blockSize.toLong)
    val positioned = Sampling.prefixSum(counted, idCol, "n")
      .filter(col("n") > 0)
      .select(col(idCol), col("cum_sum").as("s"),
        posexplode(array_remove(TextFunctions.tokens(col(textCol)), ""))
          .as(Seq("p", "tok")))
      .select(col(idCol), col("tok"),
        (col("s") + col("p")).as("g"), (col("p") === 0).as("doc_start"))
      .select(col(idCol), col("tok"), col("doc_start"),
        expr(s"g div ${blockSize}L").as("block_id"),
        pmod(col("g"), b).as("ip"))
    positioned.groupBy("block_id")
      .agg(
        array_join(transform(array_sort(collect_list(
          struct(col("ip"), col("tok").as("it")))), x => x.getField("it")),
          " ").as("seq"),
        count(lit(1)).cast("long").as("n_tokens"),
        countDistinct(col(idCol)).cast("long").as("n_docs"),
        array_join(transform(array_sort(collect_list(
          when(col("doc_start"), struct(col("ip"))))),
          x => x.getField("ip").cast("string")), ",").as("boundaries"))
  }

  /** Sliding-window document chunking — the retrieval-side splitter
    * (RAG / embedding ingestion): each document yields chunks of up to
    * `window` tokens starting every `stride` tokens, so consecutive
    * chunks overlap by `window − stride` and no token is more than a
    * chunk boundary away from full context. Output:
    * `(idCol, chunk_id, chunk, n_tokens)`; chunk 0 always exists for a
    * non-empty doc, and no chunk starts at or past the end.
    *
    * Scale shape: ONE map-only projection — tokenize, explode the
    * closed-form chunk-start sequence (≤ ⌈n/stride⌉ per doc), `slice`
    * each window out of the token array. No shuffle, no window, no
    * join; Catalyst prunes the scan to (id, text).
    */
  def slidingChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      stride: Int): DataFrame = {
    require(window >= 1, s"window=$window must be >= 1")
    require(stride >= 1 && stride <= window,
      s"stride=$stride must be in [1, window=$window]")
    df
      .select(col(idCol),
        array_remove(TextFunctions.tokens(col(textCol)), "").as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0L),
          expr(s"(cast(size(toks) as bigint) - 1L) div ${stride}L")))
          .as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("toks"),
          (col("chunk_id") * stride + 1).cast("int"), lit(window)), " ")
          .as("chunk"),
        least(lit(window.toLong),
          size(col("toks")).cast("long") - col("chunk_id") * stride)
          .as("n_tokens"))
  }
}
