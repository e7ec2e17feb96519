package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining (SURVEY.md §2.6 extension): which
  * items appear TOGETHER more than chance — the token-collocation idea
  * ([[LmScore]] PMI) lifted from adjacent positions to whole baskets
  * (orders, sessions, documents-as-bags). The support/lift table is the
  * input to association rules, complementary-item recs, and
  * "these two sources always co-occur in a crawl snapshot" audits.
  */
object Baskets {

  /** Frequent item PAIRS with support and lift. One row per unordered
    * item pair `(item_a < item_b)` co-occurring in ≥ `minSupport`
    * baskets: `(item_a, item_b, n_pair, n_a, n_b, lift)` where `n_x`
    * counts baskets containing x and
    * `lift = n_pair·N / (n_a·n_b)` (N = basket count; > 1 means the pair
    * co-occurs above independence), floor-rounded at 1e-9. Duplicate
    * (basket, item) rows collapse first — multiplicity within a basket
    * is presence, the standard basket-mining contract. Null basket/item
    * rows drop.
    *
    * Execution shape: presence table via ONE partial-aggregable
    * distinct; pair generation is a self-equi-join on the basket key —
    * fan-out per basket is C(size, 2), which is why `maxBasketSize`
    * HARD-FAILS (plan-side `raise_error`, the [[Joins.rangeJoin]] cap
    * idiom) instead of silently exploding on a pathological basket: at
    * the default 1000 a single bad basket would already emit ~500k pair
    * rows. Everything downstream is partial-aggregable groupBy; the
    * basket-count scalar rides a one-row broadcast crossJoin. No
    * driver-side state at any size. */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
                    minSupport: Long = 2, maxBasketSize: Int = 1000): DataFrame = {
    require(minSupport >= 1, s"minSupport must be ≥ 1, got $minSupport")
    require(maxBasketSize >= 2, s"maxBasketSize must be ≥ 2, got $maxBasketSize")
    // pinned: the presence table feeds FOUR consumers (sizes, both
    // self-join sides, item counts, basket-count scalar) — without the
    // pin each rebuilds the scan+distinct from scratch (plan-audited)
    val presence = Checkpoints.pinned(df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct())
    val sizes = presence.groupBy(col("__b")).agg(count(lit(1)).as("__sz"))
    val capMsg = concat(
      lit(s"frequentPairs: a basket exceeds maxBasketSize=$maxBasketSize items (basket="),
      col("__b").cast("string"), lit(", size="), col("__sz").cast("string"),
      lit(") — raise maxBasketSize or pre-filter pathological baskets"))
    val checked = presence.join(sizes, "__b")
      .withColumn("__b", when(col("__sz") <= maxBasketSize, col("__b"))
        .otherwise(raise_error(capMsg).cast(presence.schema("__b").dataType)))
      .drop("__sz")
    val nBaskets = presence.groupBy().agg(
      count_distinct(col("__b")).as("__nb"))
    val itemCounts = presence.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
    val a = checked.select(col("__b"), col("__i").as("item_a"))
    val b = checked.select(col("__b"), col("__i").as("item_b"))
    val pairs = a.join(b, Seq("__b")).filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minSupport)
    pairs
      .join(itemCounts.select(col("__i").as("item_a"), col("__c").as("n_a")), Seq("item_a"))
      .join(itemCounts.select(col("__i").as("item_b"), col("__c").as("n_b")), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_pair"), col("n_a"), col("n_b"),
        (floor(col("n_pair").cast("double") * col("__nb").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")) * 1e9 + lit(0.5)) / 1e9)
          .as("lift"))
  }

  /** Directional association rules from the frequent-pair table: each
    * surviving pair emits BOTH rules `a ⇒ b` and `b ⇒ a` with
    * `confidence = P(consequent | antecedent) = n_pair / n_antecedent`
    * (floor-rounded at 1e-9), filtered at `minConfidence`. Confidence is
    * what [[frequentPairs]]' symmetric lift cannot say: "90% of baskets
    * with a also hold b" and its (usually different) converse — the
    * actionable direction for recommendations and "source X implies
    * source Y" crawl audits. Support and lift ride along unchanged.
    *
    * Output: `(antecedent, consequent, n_pair, n_ante, confidence,
    * lift)`. The pair table is pinned once and read by both rule
    * directions — everything here is pair-table-sized, orders of
    * magnitude below the basket scan. */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
                       minSupport: Long = 2, minConfidence: Double = 0.0,
                       maxBasketSize: Int = 1000): DataFrame = {
    require(minConfidence >= 0 && minConfidence <= 1,
      s"minConfidence must be in [0,1], got $minConfidence")
    val fp = Checkpoints.pinned(
      frequentPairs(df, basketCol, itemCol, minSupport, maxBasketSize))
    val fwd = fp.select(col("item_a").as("antecedent"),
      col("item_b").as("consequent"), col("n_pair"),
      col("n_a").as("n_ante"), col("lift"))
    val rev = fp.select(col("item_b").as("antecedent"),
      col("item_a").as("consequent"), col("n_pair"),
      col("n_b").as("n_ante"), col("lift"))
    fwd.unionByName(rev)
      .withColumn("confidence",
        floor(col("n_pair").cast("double") / col("n_ante").cast("double")
          * 1e9 + lit(0.5)) / 1e9)
      .filter(col("confidence") >= minConfidence)
      .select(col("antecedent"), col("consequent"), col("n_pair"),
        col("n_ante"), col("confidence"), col("lift"))
  }
}
