package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules — the retail classic (A-priori,
  * Agrawal & Srikant 1994) restricted to the pair tier, which is where
  * virtually all production deployments stop: for item pairs that
  * co-occur in ≥ minPairSupport baskets, emit both directed rules with
  * exact fixed-point confidence and lift.
  *
  *   confidence(A→B) = n(AB)/n(A)        (2^30 floor)
  *   lift(A→B)       = n(AB)·N / (n(A)·n(B))   (2^16 floor)
  *
  * Scale shape is the textbook A-priori bound made physical: items
  * below minItemSupport leave BEFORE pair generation (the candidate-
  * pruning step IS the algorithm), so per-basket pair fan-out is
  * C(k_frequent, 2), not C(k, 2). Pairs are generated IN-ROW: one
  * basket-keyed exchange collects each basket's frequent items, and the
  * ordered combinations (item_a < item_b, killing the symmetric
  * double-count) come from a codegen array projection — no basket
  * self-join, and the pair counts combine map-side.
  * The basket total rides a broadcast 1-row aggregate, never a window.
  * All outputs int64 (counts and floored fixed-point ratios): a second
  * engine replays them bit-for-bit.
  */
object Association {

  /** @param baskets   (basketCol, itemCol) rows, duplicates allowed
    * @param minItemSupport items in fewer baskets are pruned pre-join
    * @param minPairSupport pairs in fewer baskets are dropped
    * @return (antecedent, consequent, pair_cnt, ante_cnt, cons_cnt,
    *         conf_fix 2^30, lift_fix 2^16), both rule directions,
    *         ordered by antecedent, consequent
    */
  def pairRules(baskets: DataFrame, basketCol: String, itemCol: String,
      minItemSupport: Long = 2L, minPairSupport: Long = 2L): DataFrame = {
    val d = baskets.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val freq = d.groupBy("__i").agg(count(lit(1)).as("__icnt"))
      .filter(col("__icnt") >= minItemSupport)
    val f = d.join(freq, "__i")
    val nBaskets = d.select(countDistinct("__b").as("__n"))
    // In-row pair generation (round 14; q81's window-pair pattern): the
    // basket self-join shuffled the frequent-item relation by basket id
    // on BOTH sides and materialized the C(k,2) fan-out as join output
    // rows before the pair count. Collecting each basket's (item, count)
    // structs ONCE — same single basket-keyed exchange the join needed —
    // and emitting the ordered combinations with array expressions keeps
    // the fan-out inside a codegen projection: one pass over f, no join.
    // sort_array orders by item (items are distinct within a basket), so
    // combinations (i, j>i) reproduce exactly the __ia < __ib pair set.
    // Per-basket state is C(k_frequent, 2) pairs in one row — bounded by
    // the same A-priori prune that bounded the join's fan-out.
    val items = f.groupBy("__b").agg(sort_array(
      collect_list(struct(col("__i"), col("__icnt")))).as("__its"))
    val pairs = items
      .select(explode(flatten(transform(col("__its"), (x, i) =>
        transform(slice(col("__its"), i + lit(2), size(col("__its"))),
          y => struct(x.getField("__i").as("__ia"),
            y.getField("__i").as("__ib"),
            x.getField("__icnt").as("__ca"),
            y.getField("__icnt").as("__cb")))))).as("__p"))
      .select(col("__p.__ia").as("__ia"), col("__p.__ib").as("__ib"),
        col("__p.__ca").as("__ca"), col("__p.__cb").as("__cb"))
      .groupBy("__ia", "__ib", "__ca", "__cb")
      .agg(count(lit(1)).as("__pcnt"))
      .filter(col("__pcnt") >= minPairSupport)
      .crossJoin(broadcast(nBaskets))
    val fwd = pairs.select(col("__ia").as("antecedent"),
      col("__ib").as("consequent"), col("__pcnt").as("pair_cnt"),
      col("__ca").as("ante_cnt"), col("__cb").as("cons_cnt"), col("__n"))
    val rev = pairs.select(col("__ib").as("antecedent"),
      col("__ia").as("consequent"), col("__pcnt").as("pair_cnt"),
      col("__cb").as("ante_cnt"), col("__ca").as("cons_cnt"), col("__n"))
    fwd.union(rev)
      // DECIMAL(38,0) intermediates: pair_cnt·N·2^16 overflows int64 past
      // ~2^23 baskets — the 100 TB case, not a corner
      .withColumn("conf_fix",
        expr(s"(CAST(pair_cnt AS DECIMAL(38,0)) * ${1L << 30}L) div ante_cnt"))
      .withColumn("lift_fix",
        expr("(CAST(pair_cnt AS DECIMAL(38,0)) * __n * 65536) div " +
          "(CAST(ante_cnt AS DECIMAL(38,0)) * cons_cnt)"))
      .drop("__n")
      .orderBy("antecedent", "consequent")
  }
}
