package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous majority label propagation — the community/label-
  * spreading primitive next to [[ConnectedComponents]] (LP converges to
  * DENSE neighborhoods where components only see connectivity; the
  * semi-supervised use seeds a few labeled nodes and lets the graph
  * vote). Classic LPA is run-order random; this is the DETERMINISTIC
  * synchronous variant: every round, each node adopts the most frequent
  * label among its neighbors, ties broken by the SMALLER label, and all
  * nodes update from the same previous-round snapshot — identical
  * output on any engine, run, or partitioning (the property that makes
  * it oracle-able; async LPA is not).
  *
  * Scale shape: one (neighbor → label) join + one (node, label) count
  * per round; the tie-break window partitions by node over rows bounded
  * by the node's DISTINCT neighbor labels (≤ degree). Labels stay
  * (id, long) — 16 bytes/node per round, with eager localCheckpoint per
  * round (the ConnectedComponents discipline): lineage truncated, and
  * nothing cached survives the call.
  */
object LabelProp {

  /** Run `rounds` synchronous updates. `edges` (src, dst) is read as
    * undirected; isolated nodes keep their seed label.
    */
  def sync(edges: DataFrame, nodes: DataFrame, idCol: String,
      initLabelCol: String, rounds: Int): DataFrame = {
    require(rounds >= 0)
    val ue = edges.select(col("src").cast("long").as("u"),
        col("dst").cast("long").as("v"))
      .unionByName(edges.select(col("dst").cast("long").as("u"),
        col("src").cast("long").as("v")))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)
    val ids = nodes.select(col(idCol).cast("long").as("id"))
    // localCheckpoint (eager) both truncates per-round lineage AND avoids
    // the library persist leak a returned cached relation would be
    var labels = nodes.select(col(idCol).cast("long").as("id"),
      col(initLabelCol).cast("long").as("label")).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val contrib = ue
        .join(labels.select(col("id").as("v"), col("label")), Seq("v"))
        .groupBy(col("u"), col("label")).agg(count(lit(1)).as("__c"))
      val w = Window.partitionBy("u").orderBy(col("__c").desc, col("label"))
      val picked = contrib.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("u").as("id"), col("label").as("__new"))
      labels = ids.join(picked, Seq("id"), "left")
        .join(labels.select(col("id"), col("label").as("__prev")), Seq("id"))
        .select(col("id"), coalesce(col("__new"), col("__prev")).as("label"))
        .localCheckpoint(true)
    }
    labels
  }
}
