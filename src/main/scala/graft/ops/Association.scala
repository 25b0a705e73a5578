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
  * below minItemSupport leave BEFORE the pair join (the candidate-
  * pruning step IS the algorithm), so per-basket pair fan-out is
  * C(k_frequent, 2), not C(k, 2). The pair join shuffles on basket id
  * only — one equi-join, with the a.item < b.item predicate killing
  * the symmetric double-count — and the pair counts combine map-side.
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
    val pairs = f.select(col("__b"), col("__i").as("__ia"), col("__icnt").as("__ca"))
      .join(f.select(col("__b"), col("__i").as("__ib"), col("__icnt").as("__cb")),
        "__b")
      .filter(col("__ia") < col("__ib"))
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
