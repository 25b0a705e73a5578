package graft.text

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Data-selection importance weights — the DSIR shape (Xie et al. 2023,
  * arXiv:2302.03169): score every document by how much its HASHED
  * unigram profile looks like a small target corpus versus the general
  * source corpus, then keep documents whose target affinity wins.
  *
  * Differences from the paper, chosen for engine-exactness: the
  * per-bucket statistic is the raw occurrence COUNT (integers — the
  * ln-free trick the TF-IDF tier uses), and the keep decision compares
  * cross-multiplied integer masses `tgt_mass·N_src > src_mass·N_tgt`
  * (i.e. average per-token target affinity beats source affinity) —
  * exactly reproducible by any engine, no float log-likelihood drift.
  *
  * Scale shape (100 TB): two corpus passes — one shuffle keyed on the
  * hash bucket to build the (tiny, ≤ nBuckets rows) histogram, one
  * shuffle keyed on the document to sum its buckets' masses; the
  * histogram rides back broadcast. Token hashing is the md5 draw
  * ([[Scrub.hashDraw]]) — deterministic across engines and runs.
  */
object ImportanceSampling {

  /** Hash bucket of a token: stable md5 draw mod nBuckets. */
  def bucket(tok: Column, nBuckets: Int): Column =
    pmod(Scrub.hashDraw(tok), lit(nBuckets.toLong))

  /** Tag every document with integer target/source masses and the keep
    * decision. `isTarget` marks the in-domain rows (they are scored too —
    * self-inclusion is the paper's setup for small targets).
    */
  def importanceTag(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      nBuckets: Int = 1 << 14): DataFrame = {
    val toks = df
      .select(col(idCol), isTarget.as("__t"),
        explode(split(lower(col(textCol)), "\\s+")).as("__tok"))
      .filter(col("__tok") =!= "")
      .withColumn("__b", bucket(col("__tok"), nBuckets))
    val hist = toks.groupBy("__b").agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("__tc"),
      sum(when(!col("__t"), 1L).otherwise(0L)).as("__sc"))
    // corpus token totals: a two-value scalar off the (tiny) histogram
    val totals: Row = hist.agg(
      coalesce(sum("__tc"), lit(0L)), coalesce(sum("__sc"), lit(0L))).head()
    val (nTgt, nSrc) = (totals.getLong(0), totals.getLong(1))
    toks
      .join(broadcast(hist), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum("__tc").as("tgt_mass"), sum("__sc").as("src_mass"))
      .withColumn("keep",
        (col("tgt_mass") * nSrc > col("src_mass") * nTgt).cast(IntegerType))
  }
}
