package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("as-of semantics: most recent prior, equal-ts matches, NULL when no prior") {
    val left = Seq( // (id, key, ts)
      (1L, "a", ts(100)), // after right@50 → 50
      (2L, "a", ts(200)), // equal to right@200 → 200 (<= semantics)
      (3L, "a", ts(40)),  // before any right → NULL
      (4L, "b", ts(500))  // other key → right-b@400
    ).toDF("id", "k", "t")
    val right = Seq( // (key, ts, v)
      ("a", ts(50), 1.0), ("a", ts(200), 2.0), ("a", ts(300), 3.0),
      ("b", ts(400), 4.0)
    ).toDF("k", "rt", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(out === Map(
      1L -> Some(1.0), 2L -> Some(2.0), 3L -> None, 4L -> Some(4.0)))
  }

  test("NULL in the matched right row survives (not replaced by an older value)") {
    // DuckDB ASOF semantics: the matched row is chosen by timestamp only;
    // a NULL field in it stays NULL. The broken per-column carry would
    // resurrect 1.0/"x" from ts=10 here.
    val left = Seq((1L, "a", ts(100))).toDF("id", "k", "t")
    val right = Seq(
      ("a", ts(10), Some(1.0), Some("x")),
      ("a", ts(50), None: Option[Double], None: Option[String])
    ).toDF("k", "rt", "v", "s")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("v", "s")).head()
    assert(out.isNullAt(3) && out.isNullAt(4))
  }

  test("all valueCols come from the SAME matched right row") {
    // Latest prior row is (ts=50, v=NULL, s="new"): v must be NULL and s
    // "new" — never (v=1.0 from ts=10, s="new" from ts=50) stitched.
    val left = Seq((1L, "a", ts(100))).toDF("id", "k", "t")
    val right = Seq(
      ("a", ts(10), Some(1.0), Some("old")),
      ("a", ts(50), None: Option[Double], Some("new"))
    ).toDF("k", "rt", "v", "s")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("v", "s")).head()
    assert(out.isNullAt(3))
    assert(out.getString(4) === "new")
  }

  test("duplicate right timestamps: greatest tiebreak wins, deterministically") {
    val left = Seq((1L, "a", ts(100))).toDF("id", "k", "t")
    val right = Seq(
      ("a", ts(50), 7L, 1.0), ("a", ts(50), 9L, 2.0), ("a", ts(50), 8L, 3.0)
    ).toDF("k", "rt", "seq", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt",
      valueCols = Seq("seq", "v"), tiebreakCols = Seq("seq"))
    // rerun twice to pin determinism across plans
    for (_ <- 1 to 2) {
      val r = out.collect().head
      assert(r.getLong(3) === 9L && r.getDouble(4) === 2.0)
    }
  }

  test("NULL right timestamps never match: no phantom prior row") {
    val left = Seq((1L, "a", ts(40))).toDF("id", "k", "t")
    // the only right row has a NULL ts — ASOF semantics say it can never
    // be a "prior" match (an unfiltered NULL sorts FIRST under asc and
    // would be carried as a phantom match)
    val right = Seq(("a", null.asInstanceOf[java.sql.Timestamp], 9.0))
      .toDF("k", "rt", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("v")).head()
    assert(out.isNullAt(3), s"phantom match from NULL-ts right row: $out")
  }

  test("a value column with a dot in its name resolves as a literal name, not a field path") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 5L, "v")).toDF("k", "rts", "price.usd")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts", Seq("price.usd"))
      .collect()
    assert(out.length === 1 && out.head.getString(2) === "v")
  }

  test("a tiebreak column with a dot works too (internal _tb_ name is itself dotted)") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 10L, "low", 1L), (1L, 10L, "high", 2L))
      .toDF("k", "rts", "v", "seq.no")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts", Seq("v"),
      tiebreakCols = Seq("seq.no")).collect()
    assert(out.length === 1 && out.head.getString(2) === "high") // greatest seq.no wins
  }

  test("internal/value name collisions fail fast with a readable error") {
    val left = Seq((1L, "a", ts(40), 0)).toDF("id", "k", "t", "_ts")
    val right = Seq(("a", ts(10), 1.0)).toDF("k", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("v"))
    }
    assert(e.getMessage.contains("_ts"))
  }

  test("left rows and columns all survive; right rows never multiply the left") {
    val left = Seq((1L, "a", ts(100), "payload")).toDF("id", "k", "t", "extra")
    val right = Seq(("a", ts(10), 1.0), ("a", ts(20), 2.0), ("a", ts(30), 3.0))
      .toDF("k", "rt", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("v"))
    assert(out.count() === 1) // three prior right rows, still one output row
    assert(out.columns.toSeq === Seq("id", "k", "t", "extra", "v"))
    assert(out.head().getAs[Double]("v") === 3.0) // the latest prior
  }
}
