package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed unigram-LM tokenizer induction — the OTHER dominant
  * public tokenizer family next to [[Bpe]] (Kudo 2018,
  * SentencePiece's unigram model — cited by RESULT: seed-then-prune
  * EM over a substring candidate set with Viterbi decoding, not his
  * code). Where BPE grows a vocabulary bottom-up by merging, unigram
  * starts from an over-complete substring candidate set and PRUNES:
  * each round re-estimates piece probabilities from the corpus'
  * maximum-likelihood segmentations (hard/Viterbi EM — the
  * deterministic member of the EM family: expected counts become
  * argmax counts, so every statistic is an exact integer sum and the
  * distributed path is bit-identical to the in-memory reference,
  * UnigramSpec pins it) and drops the weakest pieces until the target
  * vocabulary remains.
  *
  * All heavy passes are the same plan family as [[Bpe.trainMerges]]:
  *   - candidate seeding: ONE explode + hash agg over the
  *     vocabulary-scale word histogram (substrings ≤ `maxPieceLen`,
  *     so the blow-up is a bounded constant, not word-length²);
  *   - each EM round: ONE map-only Viterbi encode of the histogram
  *     words (the native codegen'd
  *     [[graft.functions.UnigramEncode]] kernel — the piece table
  *     rides inside the expression exactly like BPE's merge table)
  *     + ONE piece-count hash agg, both vocabulary-scale;
  *   - pruning and re-scoring: driver-side over the model-scale
  *     (≤ `seedSize`) piece table — the model being trained is the
  *     only driver data, the [[Classifier]] convention.
  *
  * 100 TB shape: the corpus is touched ONCE (the word histogram);
  * training iterations never rescan it. A web-scale histogram stays
  * distributed; the candidate table is capped at `seedSize` (top by
  * frequency), which bounds every driver structure.
  *
  * Determinism contract (what makes distributed ≡ local exact):
  * counts are integer sums of word weights; pruning ties break
  * (count desc, piece asc); scores are `ln(count / total)` computed
  * once per round from exact longs; Viterbi ties keep the longest
  * last piece ([[graft.functions.UnigramCodec]]'s strict-> rule).
  */
object Unigram {

  /** A vocabulary piece and its log-probability score. */
  case class Piece(piece: String, score: Double, count: Long)

  /** Characters absent from the vocabulary segment at this score —
    * low enough that any in-vocabulary segmentation wins, high enough
    * that unknown characters never poison neighboring choices.
    */
  val UnkScore = -100.0

  /** Candidate seed vocabulary: every substring of length ≤
    * `maxPieceLen` of every histogram word, weighted by word count —
    * one explode + hash agg. Returns `(piece, cnt)`.
    */
  def seedCandidates(
      hist: DataFrame, maxPieceLen: Int): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen=$maxPieceLen must be >= 1")
    val subs = flatten(transform(
      sequence(lit(1), length(col("word"))),
      s => transform(
        sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - s + 1)),
        l => col("word").substr(s, l))))
    hist.select(explode(subs).as("piece"), col("wc"))
      .groupBy("piece").agg(sum("wc").as("cnt"))
  }

  /** Train a unigram-LM vocabulary of `vocabSize` pieces over a
    * `(word, wc)` histogram ([[Bpe.wordHistogram]]'s shape).
    *
    * Schedule (fixed, like the classifier's iteration count): seed
    * with the top `seedSize` candidates by frequency (single
    * characters always kept — they guarantee coverage), then
    * `emRounds` rounds of { Viterbi-segment the histogram under the
    * current table → exact piece counts → prune to
    * `max(vocabSize, ⌈|V|·shrink⌉)` (final round: `vocabSize`) →
    * re-score `ln(count / total)` }. Pieces that won zero
    * segmentations die first (count 0 sorts last); single characters
    * survive pruning unconditionally but are re-scored like everything
    * else (count 0 → the [[UnkScore]] floor, so a character the
    * corpus never segments alone stays representable).
    */
  def trainPieces(
      hist: DataFrame,
      vocabSize: Int,
      maxPieceLen: Int = 6,
      seedSize: Int = 4096,
      emRounds: Int = 4,
      shrink: Double = 0.6): Seq[Piece] = {
    require(vocabSize >= 1, s"vocabSize=$vocabSize must be >= 1")
    require(emRounds >= 1, s"emRounds=$emRounds must be >= 1")
    require(shrink > 0.0 && shrink < 1.0, s"shrink=$shrink outside (0,1)")
    val cands = seedCandidates(hist, maxPieceLen)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(seedSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(cands.nonEmpty, "trainPieces: empty histogram")
    val chars = cands.filter(_._1.length == 1)
    val multi = cands.filter(_._1.length > 1)
    // initial scores from raw substring counts
    var vocab = rescore((chars ++ multi).toSeq)
    var round = 1
    while (round <= emRounds) {
      val counts = viterbiCounts(hist, vocab)
      val keep =
        if (round == emRounds) vocabSize
        else math.max(vocabSize, math.ceil(vocab.size * shrink).toInt)
      vocab = rescore(prune(vocab.map(_.piece), counts, keep))
      round += 1
    }
    vocab
  }

  /** One E-step: Viterbi-segment every histogram word under `vocab`,
    * sum word counts per piece — exact longs. Returns piece → count
    * for pieces that won ≥ 1 segmentation.
    */
  private def viterbiCounts(
      hist: DataFrame, vocab: Seq[Piece]): Map[String, Long] = {
    val pieces = vocab.map(_.piece).toArray
    val scores = vocab.map(_.score).toArray
    hist.select(explode(graft.functions.GraftFunctions.unigramEncode(
        array(col("word")), pieces, scores, UnkScore)).as("piece"),
        col("wc"))
      .groupBy("piece").agg(sum("wc").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Keep the `keep` strongest pieces by (count desc, piece asc).
    * `keep` bounds the TOTAL table; single characters are exempt from
    * dropping (coverage), so the result exceeds `keep` only when the
    * alphabet alone does.
    */
  private def prune(
      pieces: Seq[String],
      counts: Map[String, Long],
      keep: Int): Seq[(String, Long)] = {
    val withCounts = pieces.map(p => (p, counts.getOrElse(p, 0L)))
    val (chars, multi) = withCounts.partition(_._1.length == 1)
    val slots = math.max(0, keep - chars.size)
    val keptMulti = multi.sortBy { case (p, c) => (-c, p) }.take(slots)
    (chars ++ keptMulti).sortBy { case (p, c) => (-c, p) }
  }

  /** M-step: score = ln(count / total) over the kept pieces; zero
    * counts floor at [[UnkScore]] (representable but maximally weak).
    */
  private def rescore(kept: Seq[(String, Long)]): Seq[Piece] = {
    val total = kept.map(_._2).sum
    kept.map { case (p, c) =>
      val s = if (c > 0 && total > 0) StrictMath.log(c.toDouble / total)
              else UnkScore
      Piece(p, s, c)
    }
  }

  /** In-memory reference trainer — identical arithmetic and
    * tie-breaks, used by UnigramSpec to pin the distributed path
    * bit-for-bit and by callers too small to need a cluster.
    */
  def trainPiecesLocal(
      hist: Seq[(String, Long)],
      vocabSize: Int,
      maxPieceLen: Int = 6,
      seedSize: Int = 4096,
      emRounds: Int = 4,
      shrink: Double = 0.6): Seq[Piece] = {
    val counts = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    for ((w, c) <- hist; s <- 0 until w.length;
         l <- 1 to math.min(maxPieceLen, w.length - s))
      counts(w.substring(s, s + l)) += c
    val cands = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(seedSize)
    var vocab = rescore(cands.filter(_._1.length == 1) ++
      cands.filter(_._1.length > 1))
    var round = 1
    while (round <= emRounds) {
      val em = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      val table = vocab.map(p => p.piece -> p.score).toMap
      for ((w, c) <- hist; p <- encodeLocal(w, table)) em(p) += c
      val keep =
        if (round == emRounds) vocabSize
        else math.max(vocabSize, math.ceil(vocab.size * shrink).toInt)
      vocab = rescore(prune(vocab.map(_.piece), em.toMap, keep))
      round += 1
    }
    vocab
  }

  /** In-memory reference Viterbi segmentation — the ground truth
    * [[graft.functions.UnigramCodec.encodeWord]] is pinned against:
    * split points scan ascending, strictly-better replaces, so ties
    * keep the longest last piece.
    */
  def encodeLocal(word: String, table: Map[String, Double]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val maxLen = if (table.isEmpty) 1 else table.keysIterator.map(_.length).max
    val n = word.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val from = Array.fill(n + 1)(-1)
    best(0) = 0.0
    for (i <- 1 to n; j <- math.max(0, i - maxLen) until i) {
      val piece = word.substring(j, i)
      val sc = table.get(piece) match {
        case Some(s) => s
        case None if i - j == 1 => UnkScore
        case None => Double.NegativeInfinity
      }
      if (sc != Double.NegativeInfinity && best(j) + sc > best(i)) {
        best(i) = best(j) + sc
        from(i) = j
      }
    }
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) { buf += word.substring(from(p), p); p = from(p) }
    buf.reverse.toSeq
  }

  /** Subword-tokenize a corpus under a trained piece table: whitespace
    * tokens → per-word Viterbi → one flattened piece array per row —
    * [[Bpe.encode]]'s contract for the unigram model. Map-only; the
    * per-word DP runs inside the native codegen'd
    * [[graft.functions.UnigramEncode]] expression with a per-task
    * word → pieces cache.
    */
  def encode(
      df: DataFrame,
      textCol: String,
      vocab: Seq[Piece],
      outCol: String = "pieces"): DataFrame =
    df.withColumn(outCol, graft.functions.GraftFunctions.unigramEncode(
      TextFunctions.tokens(col(textCol)),
      vocab.map(_.piece).toArray, vocab.map(_.score).toArray, UnkScore))

  /** Boundary-preserving encode: one piece array PER WORD
    * (`array<array<string>>`) — [[Bpe.encodeWords]]'s contract, the
    * shape the fertility report consumes.
    */
  def encodeWords(
      df: DataFrame,
      textCol: String,
      vocab: Seq[Piece],
      outCol: String = "word_pieces"): DataFrame =
    df.withColumn(outCol, transform(
      filter(TextFunctions.tokens(col(textCol)), w => length(w) > 0),
      w => graft.functions.GraftFunctions.unigramEncode(array(w),
        vocab.map(_.piece).toArray, vocab.map(_.score).toArray, UnkScore)))
}
