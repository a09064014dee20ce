package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class FlattenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Webhook Update fixtures per FIXTURES.md A1. */
  val goodWithText =
    """{"update_id":1,"message":{"message_id":42,"from":{"id":11,"is_bot":false,"first_name":"Ana"},"chat":{"id":-100,"type":"group"},"date":1704628800,"text":"hello world"}}"""
  val goodNoText =
    """{"update_id":2,"message":{"message_id":43,"from":{"id":12,"is_bot":false,"first_name":"Bob"},"chat":{"id":-100,"type":"group"},"date":1704628900}}"""
  val editedMessage = // non-message update: reference ETL crashes on this (ipynb:582)
    """{"update_id":3,"edited_message":{"message_id":42,"chat":{"id":-100,"type":"group"},"date":1704629000}}"""
  val corrupt = """{"update_id":4,"message":{"broken"""

  def readFixtures(lines: String*): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory("flatten_fixture")
    Files.write(dir.resolve("updates.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    spark.read.schema(TelegramSchema.updateSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", TelegramSchema.CorruptCol)
      .json(dir.toString)
  }

  val day = java.time.LocalDate.of(2024, 1, 7)

  test("flatten whitelists + prefix-renames the nested fields (P2/P4)") {
    val out = Flatten(readFixtures(goodWithText), day).collect().head
    assert(out.getAs[Long]("message_id") === 42L)
    assert(out.getAs[Long]("user_id") === 11L)
    assert(out.getAs[Boolean]("user_is_bot") === false)
    assert(out.getAs[String]("user_first_name") === "Ana")
    assert(out.getAs[Long]("chat_id") === -100L)
    assert(out.getAs[String]("chat_type") === "group")
    assert(out.getAs[String]("text") === "hello world")
    assert(out.getAs[Long]("date") === 1704628800L)
    assert(out.getAs[java.sql.Date]("context_date").toString === "2024-01-07")
  }

  test("missing text flattens to NULL, row is kept (P3, ipynb:645-646)") {
    val out = Flatten(readFixtures(goodNoText), day).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("text") === null)
  }

  test("non-message updates and corrupt records are reject-routed, not fatal") {
    val raw = readFixtures(goodWithText, editedMessage, corrupt)
    assert(Flatten(raw, day).count() === 1)
    assert(Flatten.rejects(raw).count() === 2)
    // rejects preserve the original update_id for reprocessing
    val rejectIds = Flatten.rejects(raw).select("update_id")
      .collect().map(r => Option(r.get(0))).toSet
    assert(rejectIds.contains(Some(3L)))
  }

  test("enriched schema matches the Athena DDL contract") {
    val out = Flatten(readFixtures(goodWithText), day)
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      TelegramSchema.enrichedSchema.fields.map(f => (f.name, f.dataType)).toSeq)
  }
}
