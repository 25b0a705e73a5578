package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-record survivorship — the MERGE step after duplicate-cluster
  * formation ([[graft.graphs.ConnectedComponents.dedupClusters]]): a
  * cluster of duplicate records collapses to ONE merged record whose
  * every field is taken from the highest-precedence member that has
  * the field non-null (classic MDM most-recent-non-null-wins), with
  * per-field provenance (which member donated the value). Distinct
  * from canonical-survivor election (q55 keeps one whole record);
  * survivorship composes a new record field by field, so a cluster
  * whose freshest member has a null phone still gets a phone from an
  * older one.
  *
  * Plan shape: ONE cluster-keyed shuffle — every field is a
  * `max(struct(precedence…, id, value))` aggregate, so the merge is
  * partial-aggregable (map-side combined) and never collects a
  * cluster's members anywhere. The precedence tuple must be unique
  * per record within a cluster (callers append the record id as the
  * final tiebreak — [[golden]] does this), so the struct comparison
  * never reaches the value field and the survivor is total-ordered,
  * deterministic on any partitioning.
  */
object Survivorship {

  /** Merge `records` into one golden record per `clusterCol`.
    * `precedence` columns (major → minor, non-null) order members;
    * `idCol` is appended as the final tiebreak and reported as each
    * field's `<field>_src` donor. A field null across the whole
    * cluster yields a null value and null donor.
    */
  def golden(records: DataFrame, clusterCol: String, idCol: String,
      precedence: Seq[String], fields: Seq[String]): DataFrame = {
    val prec = precedence.map(col) :+ col(idCol)
    val aggs = fields.flatMap { f =>
      val pick = max(when(col(f).isNotNull,
        struct(prec :+ col(f).as("__v"): _*)))
      Seq(pick.getField("__v").as(f), pick.getField(idCol).as(s"${f}_src"))
    }
    records.groupBy(clusterCol)
      .agg(count(lit(1)).as("n_members"), aggs: _*)
  }
}
