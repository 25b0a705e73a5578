package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vocabulary construction + integer corpus encoding — the step between
  * text and tensors: rank tokens into stable dense ids (0 = most
  * frequent, ties broken lexically, the classic frequency-sorted vocab)
  * and rewrite every document as its id sequence.
  *
  * Scale shape: the vocab build is one wordcount shuffle (map-side
  * combined) followed by a rank over the AGGREGATED relation — vocab-
  * sized, not corpus-sized, so the single-partition window is bounded
  * by the vocabulary (any real tokenizer's vocab is ≤ a few 100k
  * entries and ships to every executor anyway, exactly like a tokenizer
  * file). Encoding is a narrow `element_at` over a broadcast literal
  * map — no join touches the corpus.
  */
object VocabEncode {

  /** (token, id, cnt): dense ids by (count desc, token). The window runs
    * on the aggregated vocab relation — small by construction.
    */
  def buildVocab(df: DataFrame, textCol: String): DataFrame = {
    val counts = df
      .select(explode(Decontaminate.wordTokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("cnt").desc, col("token"))
    counts.withColumn("id", (row_number().over(w) - 1).cast(LongType))
      .select("token", "id", "cnt")
  }

  /** Encode `textCol` as id sequences using a driver-collected vocab —
    * the tokenizer-artifact pattern (vocab is a bounded, shippable
    * object). Unknown tokens map to `unkId`. Output: original columns +
    * `token_ids: array<bigint>`.
    */
  def encode(spark: SparkSession, df: DataFrame, textCol: String,
      vocab: DataFrame, unkId: Long = -1L): DataFrame = {
    val entries = vocab.select("token", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val vocabMap = typedlit(entries)
    df.withColumn("token_ids",
      transform(Decontaminate.wordTokens(col(textCol)),
        t => coalesce(element_at(vocabMap, t), lit(unkId))))
  }
}
