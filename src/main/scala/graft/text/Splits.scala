package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Leakage-safe train/validation/test assignment.
  *
  * A per-document hash split leaks: a doc in train and its near-duplicate
  * in test score as held-out data the model has effectively seen. The fix
  * is to split by UNIT — hash the near-dup CLUSTER id (from
  * [[graft.graphs.ConnectedComponents.dedupClusters]]), so every member
  * of a cluster lands in the same split. The assignment is a stable md5
  * draw (engine-mirrorable, reproducible across runs); weights are
  * integer bucket counts, so the boundaries are exact.
  */
object Splits {

  /** `split` column from a stable hash of `unit`: bucket =
    * md5-draw mod Σweights, assigned to names in order by cumulative
    * weight. `Seq("train" -> 8, "val" -> 1, "test" -> 1)` ⇒ 80/10/10.
    */
  def splitColumn(unit: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive, got $weights")
    val total = weights.map(_._2).sum
    val bucket = pmod(Scrub.hashDraw(unit), lit(total.toLong))
    // first-match-wins when-chain over cumulative boundaries
    val cums = weights.scanLeft(0)(_ + _._2).tail
    weights.tail.zip(cums.tail).foldLeft(
      when(bucket < cums.head, lit(weights.head._1))) {
      case (chain, ((name, _), hi)) => chain.when(bucket < hi, lit(name))
    }
  }

  /** Assign every row a split by hashing `unitCol` (a cluster id, a
    * domain, a URL host — whatever must not straddle splits). One narrow
    * codegen'd expression: no shuffle, no RNG state, identical output on
    * every run and engine.
    */
  def byUnit(df: DataFrame, unitCol: String,
      weights: Seq[(String, Int)] = Seq("train" -> 8, "val" -> 1, "test" -> 1),
      out: String = "split"): DataFrame =
    df.withColumn(out, splitColumn(col(unitCol), weights))
}
