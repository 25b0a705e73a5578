package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space outlier detection — the junk filter of the embedding
  * curation family ([[SemDedup]] drops what is too SIMILAR; this drops
  * what is too FAR from the corpus distribution: encoding failures,
  * wrong-language strays, adversarial noise).
  *
  * A document is an outlier when its squared distance to the corpus
  * centroid exceeds alphaMilli/1000 × the corpus mean squared distance.
  * All arithmetic is EXACT so the result is independent of partitioning
  * and float-summation order (an order-dependent double centroid would
  * be nondeterministic at cluster scale, and unverifiable):
  * embeddings quantize to 2⁻¹⁶-resolution integers (floor — identical
  * on every engine), the centroid uses truncating integer division
  * (Java `/` = Spark `div` = DuckDB `//`), per-doc dist² stays in
  * int64 (≈2³⁹ at 64 dims), and the keep decision cross-multiplies in
  * DECIMAL(38,0). The ≤1-quantum centroid rounding is noise at outlier
  * granularity and buys bit-exact reproducibility.
  *
  * Scale shape: pass 1 reduces the corpus to one per-dimension sum
  * vector (posexplode + map-side-combined groupBy; the collect is
  * dim-bounded, like the k-means centroids). Pass 2 is a narrow map
  * computing each doc's dist², plus one scalar agg for the corpus
  * total. No corpus-keyed shuffle anywhere.
  */
object Outliers {

  /** floor(x · 2¹⁶) per element — deterministic integer quantization. */
  private def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 65536d).cast("long"))

  /** (idCol → vec_id, dist2_fix LONG, keep INT) for every row; keep = 0
    * marks an outlier (dist² · n · 1000 > alphaMilli · Σdist²).
    */
  def globalOutliers(df: DataFrame, idCol: String, vecCol: String,
      alphaMilli: Int): DataFrame = {
    val q = df.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("__q"))
    // pass 1: exact per-dimension sums + row count (dim-bounded collect)
    val sums = q.select(posexplode(col("__q")).as(Seq("__d", "__v")))
      .groupBy("__d").agg(sum("__v").as("__s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).map(_._2)
    val n = q.count()
    val means = sums.map(_ / n) // truncating, mirrors SQL integer division
    val meansLit = typedlit(means.toSeq)
    val dims = means.length
    // pass 2: per-doc exact dist² to the quantized centroid (narrow)
    val dist2 = aggregate(
      zip_with(col("__q"), meansLit, (x, m) => (x - m) * (x - m)),
      lit(0L), (acc, t) => acc + t)
    // Ragged guard: zip_with null-pads a vector whose length differs from
    // the corpus dimensionality, which would silently yield null
    // dist2_fix/keep. Fail loudly instead of emitting null verdicts.
    val checkedDist2 = when(size(col("__q")) === dims, dist2)
      .otherwise(raise_error(concat(
        lit(s"Outliers: embedding dimensionality != $dims for vec_id="),
        col("vec_id").cast("string"))))
    val scored = q.select(col("vec_id"), checkedDist2.as("dist2_fix"))
    val total = scored
      .agg(sum(col("dist2_fix").cast("decimal(38,0)")).as("__tot"))
    scored.crossJoin(broadcast(total))
      .select(col("vec_id"), col("dist2_fix"),
        (col("dist2_fix").cast("decimal(38,0)") * lit(n) * lit(1000)
          <= col("__tot") * lit(alphaMilli)).cast("int").as("keep"))
  }
}
