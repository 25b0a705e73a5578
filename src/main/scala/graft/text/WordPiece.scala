package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece (BERT-style) greedy tokenization over a corpus — the
  * DataFrame face of [[graft.functions.WordPieceKernel]]; same output
  * shape as [[Unigram.encode]] so the two segmenters are drop-in
  * comparable: (…, widx, tidx, token).
  */
object WordPiece {

  def encode(df: DataFrame, textCol: String, entries: Seq[String]): DataFrame = {
    val words = df.withColumn("__ws", Decontaminate.wordTokens(col(textCol)))
      .select(col("*"), posexplode(col("__ws")).as(Seq("widx", "__word")))
      .drop("__ws")
    words
      .withColumn("__toks", graft.functions.WordPieceExprs.wordpieceEncode(
        col("__word"), entries))
      .select(col("*"), posexplode(col("__toks")).as(Seq("tidx", "token")))
      .drop("__toks", "__word")
  }
}
