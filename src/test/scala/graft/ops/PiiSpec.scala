package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PII scrub: hand fixtures per pattern, near-misses that must NOT
  * redact, staged-count consistency (Σ counts ≡ placeholders
  * inserted), and the pattern-order guarantee (a card is never eaten
  * by the phone patterns).
  */
class PiiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scrubOne(s: String): String =
    Seq(Tuple1(s)).toDF("t").select(Pii.scrub($"t")).head().getString(0)

  private def detectOne(s: String): (String, Map[String, Long]) = {
    val r = Pii.detect(Seq(Tuple1(s)).toDF("t"), "t").head()
    (r.getAs[String]("pii_scrubbed"),
      Pii.Patterns.map(p => p._1 -> r.getAs[Long](s"pii_${p._1}")).toMap)
  }

  test("each pattern redacts its shape; near-misses survive") {
    assert(scrubOne("mail a.b+c_1%d@sub.example.co.uk end")
      === "mail <EMAIL> end")
    assert(scrubOne("card 4111 1111 1111 1111.") === "card <CARD>.")
    assert(scrubOne("card 4111-1111-1111-1111.") === "card <CARD>.")
    assert(scrubOne("ssn 078-05-1120 ok") === "ssn <SSN> ok")
    assert(scrubOne("call +14155552671 or 555-123-4567 now")
      === "call <PHONE> or <PHONE> now")
    assert(scrubOne("host 192.168.0.1 down") === "host <IP> down")
    // near-misses: no @tld, version strings glued to words, short digit
    // runs, 5-group sequences are not 4-group cards
    assert(scrubOne("not-an-email at example.com") === "not-an-email at example.com")
    assert(scrubOne("semverish v1.2.3 stays") === "semverish v1.2.3 stays")
    assert(scrubOne("pin 1234 stays") === "pin 1234 stays")
    assert(scrubOne("id 12-34-56 stays") === "id 12-34-56 stays")
  }

  test("order guarantee: a 16-digit card redacts as ONE card, never a phone bite") {
    val (out, counts) = detectOne("pay 4111 1111 1111 1111 fast")
    assert(out === "pay <CARD> fast")
    assert(counts("card") === 1L && counts("phone") === 0L)
    // an email containing dots/digits is consumed before the IP pass
    val (out2, counts2) = detectOne("u10.2.3.4x@ex.com here")
    assert(out2 === "<EMAIL> here")
    assert(counts2("email") === 1L && counts2("ipv4") === 0L)
  }

  test("staged counts ≡ placeholders inserted; report rolls up per group") {
    val df = Seq(
      ("a", "a@b.co and 10.0.0.1 and +12345678"),
      ("a", "nothing here"),
      // separated shapes: butted against each other, the leftmost
      // card pattern would legitimately consume "1120 4111 1111 1111"
      // (leftmost-match semantics, identical in Java and RE2)
      ("b", "078-05-1120 and card 4111 1111 1111 1111")).toDF("src", "t")
    val det = Pii.detect(df, "t")
    val tot = det.select(
      (Pii.Patterns.map(p => col(s"pii_${p._1}")).reduce(_ + _)).as("n"),
      ($"pii_scrubbed".contains("<")).as("has")).collect()
    assert(tot.map(_.getLong(0)).sum === 5L)
    val rep = Pii.report(df, "src", "t").collect()
      .map(r => r.getAs[String]("src") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("docs_with_pii"),
          r.getAs[Long]("n_email"), r.getAs[Long]("n_card"),
          r.getAs[Long]("n_ssn"), r.getAs[Long]("n_phone"),
          r.getAs[Long]("n_ipv4"))).toMap
    assert(rep("a") === ((2L, 1L, 1L, 0L, 0L, 1L, 1L)))
    assert(rep("b") === ((1L, 1L, 0L, 1L, 1L, 0L, 0L)))
  }

  test("corpus pass is clean: the raw synthetic documents carry no accidental redactions") {
    val docs = graft.Tables.load(spark, graft.TestSpark.Sf001, "documents")
    val n = Pii.detect(docs, "text")
      .select(Pii.Patterns.map(p => sum(col(s"pii_${p._1}"))).reduce(_ + _))
      .head().getLong(0)
    assert(n === 0L, "synthetic corpus unexpectedly matches a PII shape")
  }

  test("streaming monitor: stream-built incidence table ≡ batch report; redelivered batch is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft-pii-stream").toString
    val laced = graft.Tables.load(spark, graft.TestSpark.Sf001, "documents")
      .select(col("source"), concat(
        lit("u"), col("doc_id").cast("string"), lit("@ex.com or 10.0.0."),
        (col("doc_id") % 256).cast("string"), lit(" "), col("text")).as("t"))
    laced.repartition(3).write.parquet(s"$root/src")
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("source", StringType), StructField("t", StringType))))
      .option("maxFilesPerTrigger", "1").parquet(s"$root/src")
    val q = graft.streaming.PiiStream
      .monitorSink(stream, "source", "t", s"$root/tbl")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    def snap = Pii.readReport(spark, s"$root/tbl", "source")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val streamed = snap
    val direct = Pii.report(laced, "source", "t")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(streamed === direct)
    assert(graft.streaming.PiiStream.appendBatch(
      laced.limit(5), 42L, "source", "t", s"$root/tbl", streamId = "m"))
    val after = snap
    assert(!graft.streaming.PiiStream.appendBatch(
      laced.limit(5), 42L, "source", "t", s"$root/tbl", streamId = "m"))
    assert(snap === after)
  }
}
