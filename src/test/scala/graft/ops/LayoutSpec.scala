package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue: hand-computed interleave; zero; high bits dropped") {
    val df = Seq((5L, 3L)).toDF("a", "b")
    def z(bits: Int) =
      df.select(Layout.zValue($"a", $"b", bits)).head().getLong(0)
    // a=101₂ even positions, b=011₂ odd → 011011₂ = 27
    assert(z(3) === 27L)
    assert(z(16) === 27L) // leading zeros don't change the code
    assert(z(1) === 3L)   // only bit 0 of each survives: 1 | 1<<1
    assert(df.select(Layout.zValue(lit(0L), lit(0L), 16)).head().getLong(0) === 0L)
    intercept[IllegalArgumentException] { Layout.zValue($"a", $"b", 0) }
    intercept[IllegalArgumentException] { Layout.zValue($"a", $"b", 32) }
  }

  test("zValue is monotone-local: quadrant order matches curve order") {
    // The defining property used for pruning: all of quadrant (a<2ᵇ⁻¹,
    // b<2ᵇ⁻¹) sorts before any point with both high bits set.
    val pts = for (a <- 0L until 8L; b <- 0L until 8L) yield (a, b)
    val z = pts.toDF("a", "b")
      .select($"a", $"b", Layout.zValue($"a", $"b", 3).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(z.values.toSeq.distinct.size === 64, "z must be a bijection on the grid")
    val loQuad = pts.filter { case (a, b) => a < 4 && b < 4 }.map(z)
    val hiQuad = pts.filter { case (a, b) => a >= 4 && b >= 4 }.map(z)
    assert(loQuad.max < hiQuad.min)
  }

  test("zOrderBy bounds BOTH dimensions' per-file spans; linear sort only one") {
    val events = Tables.load(spark, TestSpark.Sf001, "events")
    // Bucket both dimensions to the same 4-bit grid (the documented
    // precondition: comparable bit widths, or the curve degenerates to
    // the wider dimension — exactly what an unbucketed run shows here,
    // 15 users vs ~500 value buckets).
    val ubucket = pmod(col("user_id"), lit(16L)).cast("long")
    val vbucket = least(floor(col("value") / 31), lit(15)).cast("long")
    def totalSpan(df: DataFrame, dim: org.apache.spark.sql.Column): Long =
      Layout.partitionSpans(df, dim)
        .select(sum(col("hi").cast("long") - col("lo").cast("long")))
        .head().getLong(0)

    val zLaid = Layout.zOrderBy(events, ubucket, vbucket, 4, 16)
    val linear = events.repartitionByRange(16, ubucket)
      .sortWithinPartitions(ubucket)

    // Dimension the linear layout ignores: z must shrink its spans.
    val zValueSpan = totalSpan(zLaid, vbucket)
    val linValueSpan = totalSpan(linear, vbucket)
    assert(zValueSpan < linValueSpan / 2,
      s"z-layout value spans $zValueSpan vs linear $linValueSpan — no skipping win")
    // And still bounds user_id far below 16 partitions × full range.
    val worstUser = 16L * 15L
    val zUserSpan = totalSpan(zLaid, ubucket)
    assert(zUserSpan < worstUser / 2,
      s"z-layout user spans $zUserSpan vs worst case $worstUser")
    intercept[IllegalArgumentException] {
      Layout.zOrderBy(events, ubucket, vbucket, 4, 0)
    }
  }
}
