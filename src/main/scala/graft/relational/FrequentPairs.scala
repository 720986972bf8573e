package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent co-occurring item pairs with the A-Priori candidate cut
  * (Agrawal & Srikant 1994) — basket analysis over (basket, item) rows:
  * which item pairs co-occur in at least `minPairSupport` baskets, and is
  * the co-occurrence MORE than the items' popularity predicts (lift)?
  * The curation read: co-purchase mining on orders, co-citation on docs,
  * tag affinity on events.
  *
  * Shape: the monotonicity cut first — a pair can only be frequent if both
  * items are (support ≥ `minItemSupport`) — so the quadratic self-join runs
  * over the FILTERED basket rows: distinct (basket, item) → frequent-item
  * semi-join (equi-keyed; the frequent frame is support-floored to at most
  * N/minItemSupport rows but joins by shuffle, never a driver collect) →
  * self equi-join ON THE BASKET KEY (co-partitioned — one shuffle by
  * basket feeds both sides) with item_a < item_b → pair count. Lift is
  * exact integer permille in DECIMAL(38,0): 1000·n_pair·n_baskets /
  * (c_a·c_b) crosses 2⁶³ near 1e9 baskets (the ADVICE-r7 overflow class),
  * then narrows back to long.
  *
  * The hazard A-Priori cannot cut is a single HUGE basket (k items → k²/2
  * pairs in one task); the bound is enforced loudly via `maxBasketSize`
  * rather than discovered as a straggler.
  */
object FrequentPairs {

  /** (item_a, item_b, support, lift_permille), item_a < item_b, support ≥
    * `minPairSupport`, both items ≥ `minItemSupport` baskets.
    */
  def mine(df: DataFrame, basketCol: String, itemCol: String,
           minItemSupport: Long, minPairSupport: Long,
           maxBasketSize: Int = 10000): DataFrame =
    minedPairs(df, basketCol, itemCol, minItemSupport, minPairSupport,
      maxBasketSize)
      .select(col("item_a"), col("item_b"), col("support"),
        // IntegralDivide over DECIMAL(38,0) operands → truncating long,
        // the DuckDB `//` twin (all terms positive here)
        liftPermille)

  /** Directional association rules over the same mined pairs (Agrawal &
    * Srikant 1994's confidence beside lift): each unordered frequent pair
    * unfolds into BOTH rules a→b and b→a — confidence(a→b) =
    * support(ab)/support(a) differs per direction while the symmetric
    * measures ride along — plus the two set-similarity views of the same
    * counts, cosine²(a,b) = support²/(cₐ·c_b) in micro units (squared so
    * the division stays integer-exact — no sqrt) and jaccard =
    * support/(cₐ+c_b−support) in permille. One row-local 2-way explode on
    * the answer-sized pair frame; no work beyond [[mine]]'s passes.
    *
    * (antecedent, consequent, support, confidence_permille, lift_permille,
    * cosine2_micro, jaccard_permille), rule order.
    */
  def ruleStrengths(df: DataFrame, basketCol: String, itemCol: String,
                    minItemSupport: Long, minPairSupport: Long,
                    maxBasketSize: Int = 10000): DataFrame =
    minedPairs(df, basketCol, itemCol, minItemSupport, minPairSupport,
      maxBasketSize)
      .select(col("item_a"), col("item_b"), col("support"),
        col("__ca"), col("__cb"), col("__nb"), liftPermille)
      .select(explode(array(
        struct(col("item_a").as("antecedent"), col("item_b").as("consequent"),
          col("__ca").as("__cant")),
        struct(col("item_b").as("antecedent"), col("item_a").as("consequent"),
          col("__cb").as("__cant")))).as("__d"),
        col("support"), col("__ca"), col("__cb"), col("lift_permille"))
      .select(col("__d.antecedent"), col("__d.consequent"), col("support"),
        expr("(1000L * support) div __d.__cant").as("confidence_permille"),
        col("lift_permille"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * support * support) div " +
          "(CAST(__ca AS DECIMAL(38,0)) * __cb)").as("cosine2_micro"),
        expr("(1000L * support) div (__ca + __cb - support)")
          .as("jaccard_permille"))
      .orderBy(col("antecedent"), col("consequent"))

  private val liftPermille =
    expr("(CAST(1000 AS DECIMAL(38,0)) * CAST(support AS DECIMAL(38,0))" +
      " * CAST(__nb AS DECIMAL(38,0))) div " +
      "(CAST(__ca AS DECIMAL(38,0)) * CAST(__cb AS DECIMAL(38,0)))")
      .as("lift_permille")

  /** The shared A-Priori pipeline: frequent-item cut, basket-key self
    * equi-join, pair counts, joined item counts and basket total —
    * (item_a, item_b, support, __ca, __cb, __nb). */
  private def minedPairs(df: DataFrame, basketCol: String, itemCol: String,
                         minItemSupport: Long, minPairSupport: Long,
                         maxBasketSize: Int): DataFrame = {
    require(minItemSupport >= 1 && minPairSupport >= 1)
    // b feeds four consumers (the size guard, item counts, the filtered
    // join spine, and the basket total) — land the distinct once
    val b = Stages.materialize(
      df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
        .filter(col("__b").isNotNull && col("__i").isNotNull)
        .distinct(), "fp_baskets")
    val biggest = b.groupBy(col("__b")).agg(count(lit(1)).as("k"))
      .agg(max(col("k"))).head()
    if (biggest.isNullAt(0)) return emptyResult(df, itemCol)
    require(biggest.getLong(0) <= maxBasketSize,
      s"frequentPairs: a basket holds ${biggest.getLong(0)} items > " +
        s"maxBasketSize=$maxBasketSize — one basket would emit O(k²) " +
        "pairs into a single task; cap or pre-filter baskets")
    val itemCounts = b.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minItemSupport)
    // both sides of the self-join read this frame; landing it lets the
    // join's basket-key exchange be the only shuffle it pays
    val filtered = Stages.materialize(
      b.join(itemCounts.select("__i"), Seq("__i"), "left_semi"),
      "fp_filtered")
    val pairs = filtered.as("l")
      .join(filtered.as("r"), col("l.__b") === col("r.__b") &&
        col("l.__i") < col("r.__i"))
      .groupBy(col("l.__i").as("item_a"), col("r.__i").as("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minPairSupport)
    val nBaskets = b.agg(countDistinct(col("__b")).as("__nb"))
    // the decorated pair frame is answer-sized (support-floored pairs), and
    // TWO declared consumers run it with identical arguments (the pair
    // mining row and the rule-strengths row) — land it so the basket-key
    // self-join + pair count runs once per session, not once per consumer
    // (r15, guide §2.4; the same memo-key sharing knnEdges uses)
    Stages.materialize(
      pairs
        .join(itemCounts.select(col("__i").as("item_a"), col("__c").as("__ca")),
          Seq("item_a"))
        .join(itemCounts.select(col("__i").as("item_b"), col("__c").as("__cb")),
          Seq("item_b"))
        .crossJoin(broadcast(nBaskets)),
      "fp_pairs")
  }

  private def emptyResult(df: DataFrame, itemCol: String): DataFrame = {
    val s = df.sparkSession
    import org.apache.spark.sql.types._
    val itemType = df.schema(itemCol).dataType
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("item_a", itemType),
        StructField("item_b", itemType),
        StructField("support", LongType),
        StructField("__ca", LongType),
        StructField("__cb", LongType),
        StructField("__nb", LongType))))
  }
}
