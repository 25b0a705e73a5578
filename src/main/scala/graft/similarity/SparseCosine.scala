package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** All-pairs sparse cosine similarity over term-frequency vectors via an
  * INVERTED INDEX — the exact-similarity tier that complements the
  * probabilistic near-dup family (MinHash estimates Jaccard, SimHash
  * hamming-proxies cosine; this computes true cosine on bag-of-terms
  * vectors, exactly). Classic all-pairs similarity-search shape
  * (cf. Bayardo/Ma/Srikant, "Scaling Up All Pairs Similarity Search",
  * WWW 2007): candidate pairs exist ONLY where two documents share a
  * term, so the quadratic work is confined to per-term posting lists.
  *
  * Scale levers:
  *  - document-frequency pruning: a term in more than `maxDf` documents
  *    is corpus furniture (stop-grams) carrying ~zero cosine signal but
  *    df² candidate pairs; dropping it bounds the self-join to
  *    Σ df² ≤ maxDf · Σ df. Similarity is then cosine over the PRUNED
  *    term space — the standard trade, stated rather than hidden.
  *  - only (term, id, tf) triples — no text — cross the posting-list
  *    shuffle; the pair aggregation keys on (id_a, id_b).
  *
  * Everything up to the final comparison is 64-bit integer arithmetic:
  * dot products and squared norms of integer tf vectors. cos² =
  * dot²/(‖a‖²·‖b‖²) is ONE double division of exact integers, so
  * results are bit-identical across engines (no float accumulation
  * order, no sqrt).
  */
object SparseCosine {

  /** Word n-gram terms, NON-distinct (tf counts need every occurrence);
    * strict: documents shorter than n words get no terms. Rides the
    * one-pass `WordGrams` kernel — the builtin
    * `transform(sequence, slice, array_join)` chain costs ~8 µs/gram
    * and was 90% of q62's runtime.
    */
  def wordNgrams(text: Column, n: Int): Column =
    graft.functions.TextExprs.wordGrams(text, n)

  /** (doc_id, term, tf) term-frequency triples over word n-grams. */
  def termFreq(df: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(wordNgrams(col(textCol), n)).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))

  /** All document pairs with cos² ≥ `minCos2` over df-pruned word
    * n-gram tf vectors: (id_a, id_b, dot, cos2), id_a < id_b.
    */
  def pairs(df: DataFrame, textCol: String, idCol: String, n: Int,
      maxDf: Long, minCos2: Double): DataFrame = {
    // tf feeds the df histogram, both posting-join sides, and the norms —
    // materialize it once ((doc, term, tf) triples, far smaller than the
    // text they derive from). At cluster scale this persist becomes a
    // checkpoint or a bucketed-by-term write.
    val tf = termFreq(df, textCol, idCol, n).persist()
    val keepTerms = tf.groupBy("term")
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select("term")
    val pruned = tf.join(keepTerms, Seq("term"), "left_semi")
    val norms = pruned.groupBy("doc_id")
      .agg(sum(col("tf") * col("tf")).as("norm"))
    val a = pruned.select(col("term"), col("doc_id").as("id_a"),
      col("tf").as("__tfa"))
    val b = pruned.select(col("term"), col("doc_id").as("id_b"),
      col("tf").as("__tfb"))
    val dots = a.join(b, Seq("term"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(sum(col("__tfa") * col("__tfb")).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("id_a"), col("norm").as("__na")),
        Seq("id_a"))
      .join(norms.select(col("doc_id").as("id_b"), col("norm").as("__nb")),
        Seq("id_b"))
      .withColumn("cos2",
        (col("dot") * col("dot")) / (col("__na") * col("__nb")))
      .filter(col("cos2") >= minCos2)
      .select("id_a", "id_b", "dot", "cos2")
  }
}
