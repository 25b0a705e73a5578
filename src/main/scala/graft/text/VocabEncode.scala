package graft.text

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vocabulary construction + integer corpus encoding — the step between
  * text and tensors: rank tokens into stable dense ids (0 = most
  * frequent, ties broken lexically, the classic frequency-sorted vocab)
  * and rewrite every document as its id sequence.
  *
  * Scale shape: the vocab build is one wordcount shuffle (map-side
  * combined) followed by a per-partition top-K + single bounded merge —
  * `orderBy(...).limit(topK)` plans as `TakeOrderedAndProject`, so the
  * unbounded distinct-token relation (web corpora have billions of
  * distinct "tokens": URLs, typos, hashes) is never globally sorted in
  * one task. Ranking happens on the ≤ topK survivors only. Encoding
  * picks its strategy by vocab size: a codegen'd literal-map lookup for
  * tokenizer-sized vocabs, a broadcast join for anything larger — the
  * corpus itself never becomes the build side of anything.
  */
object VocabEncode {

  /** (token, id, cnt): dense ids by (count desc, token), capped at the
    * `topK` most frequent tokens (any real tokenizer's vocab is bounded;
    * the default keeps sub-million vocabs exact).
    *
    * The rank is computed by zipping indices over the bounded result in
    * its sort order — no global `Window.orderBy`, so nothing here ever
    * funnels the full token relation through one task.
    */
  def buildVocab(df: DataFrame, textCol: String, topK: Int = 1 << 20): DataFrame = {
    val spark = df.sparkSession
    val counts = df
      .select(explode(Decontaminate.wordTokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    // Bound FIRST: per-partition heaps + one driver merge of topK rows.
    // coalesce(1) + in-partition sort then pins a deterministic order for
    // the index zip without relying on TakeOrdered's output contract.
    val top = counts.orderBy(col("cnt").desc, col("token")).limit(topK)
      .coalesce(1).sortWithinPartitions(col("cnt").desc, col("token"))
    val ranked = top.select("token", "cnt").rdd.zipWithIndex.map {
      case (r, i) => Row(r.getString(0), i, r.getLong(1))
    }
    spark.createDataFrame(ranked, StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))))
  }

  /** Encode `textCol` as id sequences. Unknown tokens map to `unkId`.
    * Output: original columns + `token_ids: array<bigint>`.
    *
    * Two strategies, chosen by probing at most `maxLiteralVocab + 1`
    * vocab rows (one bounded job, never a full count):
    *  - vocab ≤ `maxLiteralVocab`: the tokenizer-artifact pattern — the
    *    vocab ships as a plan-literal map and the lookup is a narrow,
    *    codegen'd `element_at`. No join touches the corpus.
    *  - larger: a broadcast join on the exploded (row, pos, token)
    *    relation, re-assembled per row (see [[encodeByJoin]]). The
    *    driver never materializes the vocab map.
    *
    * `keyCol`: a unique row key for the join path's re-assembly. Every
    * real corpus has one (doc_id); when absent, a scan-stamped
    * `monotonically_increasing_id` is used, which is reproducible only
    * for narrow plans over deterministic sources — pass a key if `df`
    * contains a shuffle.
    */
  def encode(spark: SparkSession, df: DataFrame, textCol: String,
      vocab: DataFrame, unkId: Long = -1L,
      maxLiteralVocab: Int = 1 << 16,
      keyCol: Option[String] = None): DataFrame = {
    val probe = vocab.select("token", "id").limit(maxLiteralVocab + 1).collect()
    if (probe.length <= maxLiteralVocab) {
      // probe IS the whole vocab (the limit didn't truncate)
      val vocabMap = typedlit(probe.map(r => (r.getString(0), r.getLong(1))).toMap)
      df.withColumn("token_ids",
        transform(Decontaminate.wordTokens(col(textCol)),
          t => coalesce(element_at(vocabMap, t), lit(unkId))))
    } else encodeByJoin(df, textCol, vocab, unkId, keyCol)
  }

  /** Join-strategy encode for vocabs too large to inline as a literal:
    * explode to (key, pos, token), broadcast-left-join the vocab,
    * re-assemble the id array in position order, join back onto the
    * original rows. Costs one corpus-sized groupBy shuffle + one keyed
    * join — the price of not shipping a multi-GB vocab inside the plan.
    */
  private def encodeByJoin(df: DataFrame, textCol: String, vocab: DataFrame,
      unkId: Long, keyCol: Option[String]): DataFrame = {
    val rid = "__graft_rid"
    val withId = keyCol match {
      case Some(k) => df.withColumn(rid, col(k))
      case None    => df.withColumn(rid, monotonically_increasing_id())
    }
    val exploded = withId.select(col(rid),
      posexplode(Decontaminate.wordTokens(col(textCol))).as(Seq("__pos", "__tok")))
    val joined = exploded.join(
      broadcast(vocab.select(col("token").as("__tok"), col("id").as("__vid"))),
      Seq("__tok"), "left")
    val ids = joined.groupBy(rid).agg(
      transform(
        array_sort(collect_list(struct(col("__pos"),
          coalesce(col("__vid"), lit(unkId)).as("id")))),
        s => s.getField("id")).as("__ids"))
    // rows whose token array was empty or null produce no exploded rows;
    // the left join puts them back, and the fix-up restores the literal
    // path's semantics (null text -> null, empty text -> []).
    withId.join(ids, Seq(rid), "left")
      .withColumn("token_ids",
        when(Decontaminate.wordTokens(col(textCol)).isNull,
          lit(null).cast(ArrayType(LongType)))
          .otherwise(coalesce(col("__ids"), array().cast(ArrayType(LongType)))))
      .drop(rid, "__ids")
  }
}
