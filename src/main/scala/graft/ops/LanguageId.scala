package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-n-gram language identification heuristic.
  *
  * Classic profile scoring (Cavnar–Trenkle shape): each language has a
  * small set of discriminative character n-grams; a document's score for
  * a language is the total occurrence count of that language's n-grams,
  * and the prediction is the argmax with a fixed priority-order tiebreak
  * so results are deterministic.
  *
  * The whole thing is a single codegen'd projection — at 100 TB this is
  * a map-only pass with no shuffle, and the n-gram counting is the
  * replace-length trick, so the column never leaves the generated code.
  */
object LanguageId {

  /** Languages in tiebreak priority order, with their marker n-grams. */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "the", "valu", "row"),
    "es" -> Seq("qu", "ta", "dat"),
    "fr" -> Seq("me", "fas", "lin"),
    "de" -> Seq("sc", "ba", "win"),
    "zh" -> Seq("sh", "ha", "par"))

  def score(text: Column, grams: Seq[String]): Column =
    grams.map(g => TextFunctions.charNgramCount(text, g))
      .reduce(_ + _).cast("long")

  /** Argmax over per-language scores; earlier profile wins ties. The
    * prediction is the first language whose score is >= every *later*
    * language's score — equivalent to first-global-max, and spelled the
    * same way as a CASE chain in the SQL oracle.
    */
  def predict(text: Column): Column = {
    val scored = profiles.map { case (l, gs) => (l, score(text, gs)) }
    scored.zipWithIndex.foldRight(lit(scored.last._1)) {
      case (((l, s), i), els) =>
        val later = scored.drop(i + 1).map(_._2)
        if (later.isEmpty) els
        else when(later.map(s >= _).reduce(_ && _), lit(l)).otherwise(els)
    }
  }

  /** doc_id, per-language scores, and the predicted language. */
  def apply(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val withScores = profiles.foldLeft(df) { case (d, (l, gs)) =>
      d.withColumn(s"score_$l", score(t, gs))
    }
    withScores.withColumn("predicted_lang", predict(t))
  }
}
