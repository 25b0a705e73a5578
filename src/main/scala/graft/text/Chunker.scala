package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the RAG / long-context prep step
  * between raw documents and an embedding or training pipeline: split
  * each document into fixed-size token windows with overlap (stride <
  * window), so no fact straddling a boundary is lost to both chunks.
  * The sibling of content-defined chunking (dedup-oriented, boundary =
  * content fingerprint): here boundaries are POSITIONAL, the right
  * shape when downstream wants uniform embedding inputs.
  *
  * Conventions (exact, engine-replayable): tokens are the repo's
  * lowercased whitespace tokenization; chunk i covers token positions
  * [i·stride, i·stride + window) 1-based-inclusive in the output;
  * chunks start at every stride multiple BELOW the token count, so the
  * final chunk may be short but a document never emits an empty chunk
  * (an empty document emits nothing); chunk text is the token join —
  * the canonical form every downstream op in this repo tokenizes back
  * to the same array.
  *
  * Scale shape: pure narrow work — one tokenize, one bounded
  * sequence-explode, one slice per row; NO shuffle of any kind (the
  * plan is scan → project → generate). Parallelism is whatever the
  * scan gives; a 100 TB corpus chunks at full scan throughput.
  */
object Chunker {

  /** @param window tokens per chunk (> 0)
    * @param stride tokens between chunk starts (0 < stride <= window)
    * @return (idCol, chunk_no, tok_start, tok_end, n_tokens, chunk_text)
    */
  def slidingWindows(docs: DataFrame, textCol: String, idCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs
      .select(col(idCol),
        graft.text.Decontaminate.wordTokens(col(textCol)).as("__toks"))
      .withColumn("__nt", size(col("__toks")))
      .filter(col("__nt") > 0)
      .withColumn("chunk_no",
        explode(sequence(lit(0),
          expr(s"(__nt - 1) div $stride"))))
      .withColumn("tok_start", col("chunk_no") * stride + 1)
      .withColumn("tok_end",
        least(col("tok_start") + lit(window - 1), col("__nt")))
      .withColumn("n_tokens", col("tok_end") - col("tok_start") + 1)
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("__toks"), col("tok_start"), lit(window))))
      .select(col(idCol), col("chunk_no").cast("long").as("chunk_no"),
        col("tok_start").cast("long").as("tok_start"),
        col("tok_end").cast("long").as("tok_end"),
        col("n_tokens").cast("long").as("n_tokens"), col("chunk_text"))
  }
}
