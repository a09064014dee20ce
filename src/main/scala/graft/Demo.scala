package graft

import graft.ops._

/** Dev smoke entry: drives the library paths that don't surface through
  * Verify's SQL-comparable queries (typed mapPartitions multimodal
  * pipeline, ANN recall). `sbt "runMain graft.Demo [sfDir]"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local("graft-demo", Sessions.cpusFromEnv())
    val docs = Tables.load(spark, dir, "documents")

    // Real image decode (JDK ImageIO): a generated mid-gray PNG must
    // come back with true dimensions and ~128 mean luminance.
    locally {
      import spark.implicits._
      val img = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 8) img.setRGB(x, y, 0x808080)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val media = Seq((1L, "image", bos.toByteArray, 8, 4, 0)).toDF(
        "doc_id", "media_type", "payload", "width", "height", "sample_rate")
      val f = Multimodal.extractFeatures(media).collect().head
      println(s"[demo] png decode features=${f.feature.mkString(",")}")

      // Real WAV decode: 0.5s of a 440 Hz sine at 8 kHz, 16-bit PCM —
      // expect sampleRate=8000, duration=0.5, RMS ≈ 0.707 * amplitude.
      val sr = 8000
      val nSamples = sr / 2
      val pcm = new Array[Byte](nSamples * 2)
      for (i <- 0 until nSamples) {
        val v = (math.sin(2 * math.Pi * 440 * i / sr) * 16384).toInt.toShort
        pcm(i * 2) = (v & 0xff).toByte
        pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      }
      val afmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
      val wavBos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), afmt, nSamples.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, wavBos)
      val wavMedia = Seq((2L, "audio", wavBos.toByteArray, 0, 0, sr)).toDF(
        "doc_id", "media_type", "payload", "width", "height", "sample_rate")
      val wf = Multimodal.extractFeatures(wavMedia).collect().head
      println(s"[demo] wav decode features=${wf.feature.mkString(",")}")
    }

    val media = Multimodal.fromDocuments(docs)
    val feats = Multimodal.extractFeatures(media)
    println(s"[demo] multimodal features rows=${feats.count()}")
    feats.show(3, truncate = false)
    println(s"[demo] empty-input features rows=" +
      s"${Multimodal.extractFeatures(Multimodal.fromDocuments(docs.limit(0))).count()}")

    val embs = Tables.load(spark, dir, "embeddings")
    val q = embs.filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    val exact = VectorOps.bruteForceTopK(embs, "vec_id", "embedding", q, 20)
      .collect().map(_.getLong(0)).toSet
    // Honesty metric: an ANN whose candidate set approaches the corpus
    // is brute force in disguise — report the scanned fraction. One
    // unlimited run per variant serves both numbers: the result is
    // ordered by cosine desc, so its first 20 rows ARE the top-20
    // (re-running at k=20 would redo the bucketing / k-means pass).
    val total = embs.count()
    val srpAll = VectorOps.srpTopK(embs, "vec_id", "embedding", q, Int.MaxValue)
      .collect().map(_.getLong(0))
    println(s"[demo] srp recall@20 = ${(exact & srpAll.take(20).toSet).size}/20 " +
      s"(scanned ${srpAll.length}/$total = ${math.round(100.0 * srpAll.length / total)}%)")
    val ivfAll = VectorOps.ivfTopK(embs, "vec_id", "embedding", q, Int.MaxValue)
      .collect().map(_.getLong(0))
    println(s"[demo] ivf recall@20 = ${(exact & ivfAll.take(20).toSet).size}/20 " +
      s"(scanned ${ivfAll.length}/$total = ${math.round(100.0 * ivfAll.length / total)}%)")

    val cleaned = CorpusPipeline.clean(docs)
    println(s"[demo] corpus clean: ${docs.count()} docs -> ${cleaned.count()} survivors")
    CorpusPipeline.stats(docs).show(truncate = false)

    telegramPipeline(spark)
    spark.stop()
  }

  /** Full reference dataflow, driven through the public pipeline API:
    * webhook JSONs in an inbox → streaming ingest (chat filter, daily
    * partitions) → D-1 batch ETL (flatten, dedup, compact) → `telegram`
    * table → the reference's Q2 and Q5.
    */
  private def telegramPipeline(spark: org.apache.spark.sql.SparkSession): Unit = {
    import java.nio.file.Files
    import graft.pipeline._
    val inbox = Files.createTempDirectory("demo_inbox")
    val raw = Files.createTempDirectory("demo_raw").toString
    val enriched = Files.createTempDirectory("demo_enriched").toString
    def m(u: Long, mid: Long, chat: Long, date: Long, text: String) =
      s"""{"update_id":$u,"message":{"message_id":$mid,"from":{"id":7,"is_bot":false,"first_name":"Ana"},"chat":{"id":$chat,"type":"group"},"date":$date,"text":"$text"}}"""
    Files.write(inbox.resolve("a.json"), java.util.List.of(
      m(1, 1, -100, 1704628800L, "hello"),
      m(2, 2, -100, 1704628860L, "world"),
      m(3, 3, -999, 1704628920L, "wrong chat"),
      m(4, 2, -100, 1704628860L, "world"), // redelivery
      """{"update_id":5,"edited_message":{"message_id":1}}""",
      "garbage not json"))
    val q = IngestJob.start(spark, inbox.toString, raw, raw + ".ckpt", chatId = -100L)
    q.awaitTermination()
    val day = java.time.LocalDate.now(java.time.ZoneId.of(IngestJob.PipelineTz))
    val (rows, rejects) = EtlJob.run(spark, raw, enriched, day)
    EtlJob.registerTable(spark, enriched)
    println(s"[demo] telegram etl: rows=$rows rejects=$rejects (expect 2, 0: " +
      "wrong-chat/corrupt dropped at ingest, redelivery deduped at etl)")
    println("[demo] telegram Q2:")
    TelegramQueries.sql(spark, 2).show(truncate = false)
    println("[demo] telegram Q5:")
    TelegramQueries.sql(spark, 5).show(truncate = false)
  }
}
