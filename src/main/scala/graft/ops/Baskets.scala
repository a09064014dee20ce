package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket pair affinity: support / confidence / lift for
  * unordered item pairs that co-occur in at least `minPairCount`
  * baskets — the association-rule readout (Agrawal & Srikant 1994's
  * pairwise case) behind "users who bought A also bought B" and, in a
  * corpus context, tag/domain co-occurrence. Distinct from
  * [[TextAnalysis.pmiCollocations]]: baskets are unordered sets, not
  * token sequences, and the readout is the rule direction
  * (confidence both ways) plus lift rather than PMI.
  *
  * Scale shape: the basket→item relation is deduplicated, Apriori-
  * pruned (an item in fewer than `minPairCount` baskets cannot be in
  * a qualifying pair — the prune is lossless and runs BEFORE any
  * pairing), then pair generation is a basket-keyed self equi-join:
  * one exchange on the basket key, per-basket quadratic expansion
  * bounded by `maxBasketItems` (a mega-basket would otherwise own
  * the stage — baskets past the cap are dropped whole, the named
  * guard). Support tables are item-scale hash aggs; the final
  * attach joins are item-keyed; only the 1-row basket total
  * broadcasts.
  */
object Baskets {

  def pairAffinity(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairCount: Long = 2L,
      maxBasketItems: Int = 10000): DataFrame = {
    require(minPairCount >= 1, s"pairAffinity: minPairCount >= 1, got $minPairCount")
    require(maxBasketItems >= 2, s"pairAffinity: maxBasketItems >= 2, got $maxBasketItems")
    val items = df.select(col(basketCol), col(itemCol)).distinct()
    val tot = items.select(basketCol).distinct()
      .agg(count(lit(1)).cast("double").as("n_baskets"))
    val supp = items.groupBy(col(itemCol)).agg(count(lit(1)).as("s"))
    // Apriori prune: pair support <= each member's support
    val frequentItems = supp.filter(col("s") >= minPairCount).select(col(itemCol))
    val sized = items.join(frequentItems, Seq(itemCol))
      .groupBy(col(basketCol))
      .agg(collect_list(col(itemCol)).as("_items"))
      .filter(size(col("_items")) <= maxBasketItems && size(col("_items")) >= 2)
    // per-basket pair expansion from the collected (capped) item array:
    // the basket exchange happened once, in the groupBy above
    val pairs = sized
      .select(explode(expr(
        "flatten(transform(_items, (x, i) -> " +
          "transform(filter(_items, (y, j) -> j > i), " +
          "y -> struct(least(x, y) AS a, greatest(x, y) AS b))))")).as("p"))
      .select(col("p.a").as("item_a"), col("p.b").as("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    val sa = supp.select(col(itemCol).as("item_a"), col("s").as("n_a"))
    val sb = supp.select(col(itemCol).as("item_b"), col("s").as("n_b"))
    pairs.join(sa, Seq("item_a")).join(sb, Seq("item_b"))
      .crossJoin(broadcast(tot))
      .select(col("item_a"), col("item_b"),
        col("n_a"), col("n_b"), col("n_ab"),
        round(col("n_ab").cast("double") / col("n_baskets"), 6).as("support"),
        round(col("n_ab").cast("double") / col("n_a").cast("double"), 6)
          .as("conf_a_to_b"),
        round(col("n_ab").cast("double") / col("n_b").cast("double"), 6)
          .as("conf_b_to_a"),
        round(col("n_baskets") * col("n_ab").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6).as("lift"))
  }
}
