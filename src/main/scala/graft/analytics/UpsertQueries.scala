package graft.analytics

import graft.{NamedQuery, Tables}
import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 family: the coordinated corpus-upsert lifecycle
  * ([[graft.ops.CorpusUpsert]]) and the positional-postings probes
  * ([[graft.ops.LexIndex.bm25PhraseProbe]] /
  * [[graft.ops.LexIndex.bm25ProximityProbe]]).
  *
  * Oracle strategy: the upsert entry probes each index in a regime
  * where the approximate machinery is EXHAUSTIVE (every cluster
  * probed, shortlist ≥ corpus), so the readouts are pure arithmetic
  * over the post-upsert corpus and DuckDB replays them end to end —
  * the q193/q194 lifecycle-oracle pattern. The coordination protocol
  * itself (crash windows, redelivery, rev assignment) is pinned in
  * CorpusUpsertSpec; cluster routing and shortlist recall keep their
  * own suites (SimilaritySpec/PqSpec).
  */
object UpsertQueries {

  /** Frozen routing geometry for q230 — seeded k-means centroids + PQ
    * sub-codebooks are deterministic per corpus dir, so recompute vs
    * reuse is result-identical (the q133GateMemo convention); the
    * upsert LIFECYCLE itself re-runs on every invocation.
    */
  private val q230GeoMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[Array[Double]], Pq.PqModel)]()

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  private def clearRoot(root: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }

  private def stageRoot(tag: String, dir: String): java.nio.file.Path =
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_stage",
      s"${tag}_${Integer.toHexString(dir.hashCode)}")

  val all: Seq[NamedQuery] = Seq(

    // The full coordinated corpus lifecycle over all FOUR persisted
    // index layouts at once: bootstrap empty geometry → base corpus as
    // the first upsert batch → a revision batch (doc%6=2 gets new text
    // + negated embedding; the superseded rid is tombstoned in every
    // index) → a cross-index takedown (doc%10=2's CURRENT revision) →
    // one probe per layout. Exhaustive-probe regime (nProbe = all
    // clusters, PQ shortlist ≥ corpus) makes every readout pure
    // arithmetic over the post-upsert ACTIVE corpus, so the whole
    // thing is END-TO-END ORACLE: DuckDB rebuilds the revised corpus
    // and replays BM25 (q194's formula), exact cosine top-k (q25's),
    // and the sign-bit Hamming pair relation (q193's) against it.
    NamedQuery(
      "q230_corpus_upsert",
      Some("""WITH base AS (
             |  SELECT d.doc_id,
             |    CASE WHEN d.doc_id % 6 = 2 THEN d.text || ' graftrev'
             |         ELSE d.text END AS text,
             |    CASE WHEN d.doc_id % 6 = 2
             |         THEN list_transform(e.embedding, x -> -x)
             |         ELSE e.embedding END AS emb,
             |    CASE WHEN d.doc_id % 6 = 2 THEN 1 ELSE 0 END AS rev
             |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
             |active AS (SELECT * FROM base WHERE doc_id % 10 <> 2),
             |tok AS (SELECT doc_id, rev, string_split(text, ' ') tok FROM active),
             |l AS (SELECT doc_id, CAST(len(tok) AS DOUBLE) dl FROM tok),
             |st AS (SELECT CAST(count(*) AS DOUBLE) n_docs, AVG(dl) avgdl FROM l),
             |ex AS (SELECT doc_id, rev, unnest(tok) w FROM tok),
             |tf AS (SELECT doc_id, rev, w, CAST(count(*) AS DOUBLE) tf FROM ex
             |       WHERE w IN ('vector', 'join', 'scan') GROUP BY doc_id, rev, w),
             |dfq AS (SELECT w, CAST(count(*) AS DOUBLE) df FROM tf GROUP BY w),
             |bm AS (SELECT 'bm25' AS kind, CAST(-1 AS BIGINT) AS qid, tf.doc_id,
             |         CAST(tf.rev AS BIGINT) AS rev,
             |         ROUND(SUM(ln((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
             |           * tf.tf * 2.2
             |           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / st.avgdl))), 6) AS score
             |       FROM tf JOIN dfq USING (w) JOIN l USING (doc_id) CROSS JOIN st
             |       GROUP BY tf.doc_id, tf.rev),
             |av AS (SELECT doc_id, rev,
             |         list_transform(emb, x -> CAST(x AS DOUBLE)) v
             |       FROM active),
             |avn AS (SELECT * FROM av WHERE list_dot_product(v, v) > 0),
             |q AS (SELECT list_transform(emb, x -> CAST(x AS DOUBLE)) qv
             |      FROM base WHERE doc_id = 0),
             |co AS (SELECT doc_id, rev,
             |         ROUND(list_dot_product(v, qv)
             |           / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cosine
             |       FROM avn, q),
             |topk AS (SELECT doc_id, rev, cosine FROM co
             |         ORDER BY cosine DESC, doc_id LIMIT 20),
             |iv AS (SELECT 'ivf' AS kind, CAST(-1 AS BIGINT) AS qid, doc_id,
             |         CAST(rev AS BIGINT) AS rev, cosine AS score FROM topk),
             |pq AS (SELECT 'pq' AS kind, CAST(-1 AS BIGINT) AS qid, doc_id,
             |         CAST(rev AS BIGINT) AS rev, cosine AS score FROM topk),
             |hmraw AS (SELECT q.doc_id AS qid, n.doc_id, n.rev,
             |            CAST(list_sum(list_transform(range(64),
             |              i -> CASE WHEN (q.emb[i+1] > 0) = (n.emb[i+1] > 0)
             |                   THEN 0 ELSE 1 END)) AS BIGINT) AS h
             |          FROM base q, active n),
             |hm AS (SELECT 'ham' AS kind, qid, doc_id, CAST(rev AS BIGINT) AS rev,
             |         CAST(h AS DOUBLE) AS score FROM hmraw WHERE h <= 15)
             |SELECT kind, qid, doc_id, rev, score FROM (
             |  SELECT * FROM bm UNION ALL SELECT * FROM iv
             |  UNION ALL SELECT * FROM pq UNION ALL SELECT * FROM hm)
             |ORDER BY kind, qid, doc_id""".stripMargin),
      (s, dir) => {
        var tLast = System.nanoTime()
        def lap(tag: String): Unit = {
          val now = System.nanoTime()
          if (sys.env.contains("GRAFT_UPSERT_TIMING"))
            println(f"UPSERT_LAP $tag ${(now - tLast) / 1e9}%.2f")
          tLast = now
        }
        val root = stageRoot("upsert", dir)
        clearRoot(root)
        val rid = CorpusUpsert.RidCol
        val corpus0 = docs(s, dir).select(col("doc_id"), col("text"))
          .join(embs(s, dir).select(col("vec_id").as("doc_id"),
            col("embedding")), Seq("doc_id"))
        val revised = corpus0.filter(col("doc_id") % 6 === 2)
          .select(col("doc_id"),
            concat(col("text"), lit(" graftrev")).as("text"),
            transform(col("embedding"), x => -x).as("embedding"))
        lap("setup")
        val (cents, model) = q230GeoMemo.computeIfAbsent(dir, _ =>
          (VectorOps.kmeansCentroids(corpus0, "embedding", 16),
            Pq.pqTrain(corpus0, "embedding", m = 8, codebook = 16)))
        lap("train")
        val (upsRoot, bm25P, ivfP, pqP, hamP) =
          (s"$root/ups", s"$root/bm25", s"$root/ivf", s"$root/pq",
            s"$root/ham")
        // bootstrap the two meta-carrying layouts empty (the documented
        // stream pattern); the cluster layouts materialize on first
        // publish. The two bootstraps are independent empty writes —
        // run them concurrently.
        locally {
          import scala.concurrent.{Await, ExecutionContext, Future}
          implicit val ec: ExecutionContext = ExecutionContext.global
          Seq(
            Future(LexIndex.bm25WriteIndex(
              corpus0.select(col("doc_id").as(rid), col("text")).limit(0),
              rid, "text", bm25P, buckets = 32)),
            Future(HammingIndex.hammingWriteIndex(
              corpus0.select(col("doc_id").as(rid), col("embedding"))
                .limit(0),
              rid, "embedding", hamP, nBands = 8, nBuckets = 8, dim = 64)))
            .foreach(Await.result(_,
              scala.concurrent.duration.Duration.Inf))
        }
        val targets = Seq(
          CorpusUpsert.Bm25Target(bm25P, "text"),
          CorpusUpsert.IvfTarget(ivfP, "embedding", cents),
          CorpusUpsert.PqIvfTarget(pqP, "embedding", model, cents),
          CorpusUpsert.HammingTarget(hamP, "embedding"))
        lap("bootstrap")
        CorpusUpsert.applyBatch(corpus0, "doc_id", "base", upsRoot, targets)
        lap("base")
        CorpusUpsert.applyBatch(revised, "doc_id", "rev1", upsRoot, targets)
        lap("rev1")
        CorpusUpsert.deleteDocs(
          corpus0.filter(col("doc_id") % 10 === 2).select("doc_id"),
          "doc_id", upsRoot, targets)
        lap("delete")
        val query = embs(s, dir).filter(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0).map(_.toDouble)
        def decoded(df: DataFrame, kind: String, qid: org.apache.spark.sql.Column,
            score: org.apache.spark.sql.Column): DataFrame =
          df.select(lit(kind).as("kind"), qid.cast("long").as("qid"),
            CorpusUpsert.docOf(col(rid)).as("doc_id"),
            CorpusUpsert.revOf(col(rid)).as("rev"),
            score.cast("double").as("score"))
        val bm = decoded(LexIndex.bm25ProbeIndex(s, bm25P, rid,
          Seq("vector", "join", "scan")), "bm25", lit(-1L), col("bm25"))
        val iv = decoded(VectorOps.ivfProbeIndex(s, ivfP, cents, rid,
          query, 20, nProbe = cents.length), "ivf", lit(-1L), col("cosine"))
        val pqr = decoded(Pq.pqIvfProbe(s, pqP, model, cents, rid, query,
          20, nProbe = cents.length, overFetch = 200), "pq", lit(-1L),
          col("cosine"))
        val finalQ = corpus0.filter(col("doc_id") % 6 =!= 2)
          .unionByName(revised)
          .select(col("doc_id").as(rid), col("embedding"))
        val hm = CorpusUpsert.withDocRev(
          HammingIndex.hammingProbeIndex(s, finalQ, rid, "embedding",
            hamP, radius = 15)
            .withColumnRenamed("n_id", rid), rid)
          .select(lit("ham").as("kind"), col("q_id").cast("long").as("qid"),
            col("doc_id"), col("rev"), col("hamming").cast("double").as("score"))
        lap("probes_built")
        bm.unionByName(iv).unionByName(pqr).unionByName(hm)
          .orderBy("kind", "qid", "doc_id")
      }),

    // Exact phrase search over POSITIONAL BM25 postings — the n-gram
    // gap single-term BM25 leaves open. Index carries sorted 0-based
    // position arrays per posting; the probe prunes to the phrase
    // terms' tb= buckets, cuts to docs containing ALL terms in one
    // hash agg, and verifies adjacency with one higher-order
    // expression (anchor positions of the first term, array_contains
    // at p+j for the rest). Tombstoned docs (the delete lifecycle the
    // positions ride through untouched) stay excluded. Oracle replays
    // tokenization + anchored adjacency with DuckDB list lambdas.
    NamedQuery(
      "q231_bm25_phrase",
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') tok
             |           FROM documents WHERE doc_id % 7 <> 3),
             |p2 AS (SELECT 'vector scan' AS phrase, doc_id,
             |         len(list_filter(range(len(tok) - 1),
             |           i -> tok[i+1] = 'vector' AND tok[i+2] = 'scan')) AS ptf
             |       FROM t),
             |p3 AS (SELECT 'the table key' AS phrase, doc_id,
             |         len(list_filter(range(len(tok) - 2),
             |           i -> tok[i+1] = 'the' AND tok[i+2] = 'table'
             |                AND tok[i+3] = 'key')) AS ptf
             |       FROM t)
             |SELECT phrase, doc_id, CAST(ptf AS BIGINT) AS phrase_tf
             |FROM (SELECT * FROM p2 UNION ALL SELECT * FROM p3)
             |WHERE ptf > 0 ORDER BY phrase, doc_id""".stripMargin),
      (s, dir) => {
        val root = stageRoot("phrase", dir)
        clearRoot(root)
        val d = docs(s, dir)
        LexIndex.bm25WriteIndex(d, "doc_id", "text", root.toString,
          buckets = 32, positional = true)
        LexIndex.bm25DeleteIds(d.filter(col("doc_id") % 7 === 3),
          "doc_id", root.toString)
        def probe(phrase: Seq[String]): DataFrame =
          LexIndex.bm25PhraseProbe(s, root.toString, "doc_id", phrase)
            .select(lit(phrase.mkString(" ")).as("phrase"), col("doc_id"),
              col("phrase_tf"))
        probe(Seq("vector", "scan"))
          .unionByName(probe(Seq("the", "table", "key")))
          .orderBy("phrase", "doc_id")
      }),

    // Proximity search over the same positional layout: documents
    // where both terms occur within a 5-token window, with the EXACT
    // minimal span (for each anchor occurrence p, the tightest window
    // starting at p ends at max over terms of first-occurrence >= p;
    // the optimum is attained at the window's leftmost occupant).
    // Oracle replays the identical anchor scan in DuckDB list lambdas.
    NamedQuery(
      "q232_bm25_proximity",
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') tok
             |           FROM documents WHERE doc_id % 7 <> 3),
             |p AS (SELECT doc_id,
             |        list_filter(range(len(tok)), i -> tok[i+1] = 'vector') pa,
             |        list_filter(range(len(tok)), i -> tok[i+1] = 'window') pb
             |      FROM t),
             |c AS (SELECT doc_id, pa, pb, list_sort(list_concat(pa, pb)) anc
             |      FROM p WHERE len(pa) > 0 AND len(pb) > 0),
             |s AS (SELECT doc_id,
             |        list_min(list_transform(anc, a ->
             |          greatest(
             |            coalesce(list_min(list_filter(pa, q -> q >= a)), 2147483647),
             |            coalesce(list_min(list_filter(pb, q -> q >= a)), 2147483647))
             |          - a)) + 1 AS span
             |      FROM c)
             |SELECT doc_id, CAST(span AS BIGINT) AS span FROM s
             |WHERE span <= 5 ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val root = stageRoot("prox", dir)
        clearRoot(root)
        val d = docs(s, dir)
        LexIndex.bm25WriteIndex(d, "doc_id", "text", root.toString,
          buckets = 32, positional = true)
        LexIndex.bm25DeleteIds(d.filter(col("doc_id") % 7 === 3),
          "doc_id", root.toString)
        LexIndex.bm25ProximityProbe(s, root.toString, "doc_id",
            Seq("vector", "window"), window = 5)
          .orderBy("doc_id")
      }),

    // Phrase-RANKED retrieval: the q231 exact-phrase matches scored
    // with the Okapi formula treating the phrase as one term (tf =
    // occurrence count, df = matching-doc count) over the index's
    // live tombstone-exact N/avgdl — the retrieval composition a
    // phrase search feeds. END-TO-END ORACLE: DuckDB replays
    // tokenisation, anchored adjacency, df/N/avgdl and the score.
    NamedQuery(
      "q234_bm25_phrase_rank",
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') tok
             |           FROM documents WHERE doc_id % 7 <> 3),
             |l AS (SELECT doc_id, CAST(len(tok) AS DOUBLE) dl FROM t),
             |st AS (SELECT CAST(count(*) AS DOUBLE) n_docs, AVG(dl) avgdl FROM l),
             |p AS (SELECT doc_id, CAST(len(list_filter(range(len(tok) - 1),
             |        i -> tok[i+1] = 'vector' AND tok[i+2] = 'scan'))
             |        AS DOUBLE) ptf FROM t),
             |m AS (SELECT * FROM p WHERE ptf > 0),
             |dfp AS (SELECT CAST(count(*) AS DOUBLE) df_p FROM m)
             |SELECT m.doc_id, CAST(m.ptf AS BIGINT) AS phrase_tf,
             |  ROUND(ln((st.n_docs - dfp.df_p + 0.5) / (dfp.df_p + 0.5) + 1.0)
             |    * m.ptf * 2.2
             |    / (m.ptf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / st.avgdl)), 6) AS bm25
             |FROM m JOIN l USING (doc_id) CROSS JOIN st CROSS JOIN dfp
             |ORDER BY bm25 DESC, doc_id""".stripMargin),
      (s, dir) => {
        val root = stageRoot("phrank", dir)
        clearRoot(root)
        val d = docs(s, dir)
        LexIndex.bm25WriteIndex(d, "doc_id", "text", root.toString,
          buckets = 32, positional = true)
        LexIndex.bm25DeleteIds(d.filter(col("doc_id") % 7 === 3),
          "doc_id", root.toString)
        LexIndex.bm25PhraseRank(s, root.toString, "doc_id",
            Seq("vector", "scan"))
          .orderBy(col("bm25").desc, col("doc_id"))
      }),

    // The 15th REAL stream: the daily-refresh loop as a stream. The
    // base corpus lands as a batch apply; three DISJOINT revision
    // classes (doc%6=2 / doc%9=4 / doc%9=7 — provably non-overlapping
    // residues, so micro-batch arrival order cannot change the final
    // state) then stream through CorpusUpsertStream, each micro-batch
    // one coordinated applyBatch across the BM25 + Hamming targets
    // (the two bootstrap-able layouts — no trained geometry, so the
    // stream entry prices the streaming wrapper, not k-means). No
    // _graft_batches ledger: applyBatch's own markers absorb
    // redelivery. HASH-GATED end to end: the final corpus is
    // deterministic, so DuckDB replays BM25 scores and the sign-bit
    // Hamming pair relation over it (the q219/q229 convention).
    NamedQuery(
      "q233_stream_upsert",
      Some("""WITH base AS (
             |  SELECT d.doc_id,
             |    CASE WHEN d.doc_id % 6 = 2 THEN d.text || ' r1x'
             |         WHEN d.doc_id % 9 = 4 THEN d.text || ' r2x'
             |         WHEN d.doc_id % 9 = 7 THEN d.text || ' r3x'
             |         ELSE d.text END AS text,
             |    CASE WHEN d.doc_id % 6 = 2 OR d.doc_id % 9 = 4
             |           OR d.doc_id % 9 = 7
             |         THEN list_transform(e.embedding, x -> -x)
             |         ELSE e.embedding END AS emb,
             |    CASE WHEN d.doc_id % 6 = 2 OR d.doc_id % 9 = 4
             |           OR d.doc_id % 9 = 7 THEN 1 ELSE 0 END AS rev
             |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
             |tok AS (SELECT doc_id, rev, string_split(text, ' ') tok FROM base),
             |l AS (SELECT doc_id, CAST(len(tok) AS DOUBLE) dl FROM tok),
             |st AS (SELECT CAST(count(*) AS DOUBLE) n_docs, AVG(dl) avgdl FROM l),
             |ex AS (SELECT doc_id, rev, unnest(tok) w FROM tok),
             |tf AS (SELECT doc_id, rev, w, CAST(count(*) AS DOUBLE) tf FROM ex
             |       WHERE w IN ('vector', 'join', 'scan') GROUP BY doc_id, rev, w),
             |dfq AS (SELECT w, CAST(count(*) AS DOUBLE) df FROM tf GROUP BY w),
             |bm AS (SELECT 'bm25' AS kind, CAST(-1 AS BIGINT) AS qid, tf.doc_id,
             |         CAST(tf.rev AS BIGINT) AS rev,
             |         ROUND(SUM(ln((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
             |           * tf.tf * 2.2
             |           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / st.avgdl))), 6) AS score
             |       FROM tf JOIN dfq USING (w) JOIN l USING (doc_id) CROSS JOIN st
             |       GROUP BY tf.doc_id, tf.rev),
             |hmraw AS (SELECT q.doc_id AS qid, n.doc_id, n.rev,
             |            CAST(list_sum(list_transform(range(64),
             |              i -> CASE WHEN (q.emb[i+1] > 0) = (n.emb[i+1] > 0)
             |                   THEN 0 ELSE 1 END)) AS BIGINT) AS h
             |          FROM base q, base n),
             |hm AS (SELECT 'ham' AS kind, qid, doc_id, CAST(rev AS BIGINT) AS rev,
             |         CAST(h AS DOUBLE) AS score FROM hmraw WHERE h <= 15)
             |SELECT kind, qid, doc_id, rev, score FROM (
             |  SELECT * FROM bm UNION ALL SELECT * FROM hm)
             |ORDER BY kind, qid, doc_id""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        import org.apache.spark.sql.types._
        val root = stageRoot("upstream", dir)
        clearRoot(root)
        val rid = CorpusUpsert.RidCol
        val corpus0 = docs(s, dir).select(col("doc_id"), col("text"))
          .join(embs(s, dir).select(col("vec_id").as("doc_id"),
            col("embedding")), Seq("doc_id"))
        def revClass(pred: org.apache.spark.sql.Column, marker: String) =
          corpus0.filter(pred)
            .select(col("doc_id"),
              concat(col("text"), lit(marker)).as("text"),
              transform(col("embedding"), x => -x).as("embedding"))
        val r1 = revClass(col("doc_id") % 6 === 2, " r1x")
        val r2 = revClass(col("doc_id") % 9 === 4, " r2x")
        val r3 = revClass(col("doc_id") % 9 === 7, " r3x")
        val (upsRoot, bm25P, hamP, src, ckpt) =
          (s"$root/ups", s"$root/bm25", s"$root/ham", s"$root/src",
            s"$root/ckpt")
        LexIndex.bm25WriteIndex(
          corpus0.select(col("doc_id").as(rid), col("text")).limit(0),
          rid, "text", bm25P, buckets = 32)
        HammingIndex.hammingWriteIndex(
          corpus0.select(col("doc_id").as(rid), col("embedding")).limit(0),
          rid, "embedding", hamP, nBands = 8, nBuckets = 8, dim = 64)
        val targets = Seq(
          CorpusUpsert.Bm25Target(bm25P, "text"),
          CorpusUpsert.HammingTarget(hamP, "embedding"))
        CorpusUpsert.applyBatch(corpus0, "doc_id", "base", upsRoot,
          targets)
        Seq(r1, r2, r3).foreach(
          _.coalesce(1).write.mode("append").parquet(src))
        val stream = s.readStream
          .schema(StructType(Seq(
            StructField("doc_id", LongType),
            StructField("text", StringType),
            StructField("embedding", ArrayType(FloatType)))))
          .option("maxFilesPerTrigger", "1")
          .parquet(src)
        val q = graft.streaming.CorpusUpsertStream
          .upsertSink(stream, "doc_id", upsRoot, targets)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val bm = CorpusUpsert.withDocRev(
          LexIndex.bm25ProbeIndex(s, bm25P, rid,
            Seq("vector", "join", "scan")), rid)
          .select(lit("bm25").as("kind"), lit(-1L).as("qid"),
            col("doc_id"), col("rev"),
            col("bm25").cast("double").as("score"))
        val finalQ = corpus0
          .filter(col("doc_id") % 6 =!= 2 && col("doc_id") % 9 =!= 4 &&
            col("doc_id") % 9 =!= 7)
          .unionByName(r1).unionByName(r2).unionByName(r3)
          .select(col("doc_id").as(rid), col("embedding"))
        val hm = CorpusUpsert.withDocRev(
          HammingIndex.hammingProbeIndex(s, finalQ, rid, "embedding",
            hamP, radius = 15)
            .withColumnRenamed("n_id", rid), rid)
          .select(lit("ham").as("kind"), col("q_id").cast("long").as("qid"),
            col("doc_id"), col("rev"),
            col("hamming").cast("double").as("score"))
        bm.unionByName(hm).orderBy("kind", "qid", "doc_id")
      })
  )
}
