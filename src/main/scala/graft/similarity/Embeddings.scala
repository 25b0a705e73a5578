package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding storage/normalization utilities for the 100 TB path.
  *
  * At corpus scale the embedding column dominates storage: float32×dim.
  * Symmetric int8 quantization cuts it 4× (byte array + one float scale
  * per row) at ≲0.4% cosine error on unit-norm vectors — the standard
  * trade for ANN candidate generation, with exact re-scoring reading the
  * float column for finalists only.
  */
object Embeddings {

  /** L2-normalize an `array<float>` column (unit vector, double math). */
  def l2Normalize(vec: Column): Column = {
    val norm = sqrt(aggregate(transform(vec, v => v.cast(DoubleType) * v.cast(DoubleType)),
      lit(0.0), (a, v) => a + v))
    transform(vec, v => (v.cast(DoubleType) / norm).cast(FloatType))
  }

  /** Symmetric int8 quantization: scale = max|v| / 127, stored values
    * round(v / scale) ∈ [-127, 127]. Returns a struct (q: array<tinyint>,
    * scale: float). Zero vectors quantize to scale 0 and all-zero codes.
    */
  def quantizeInt8(vec: Column): Column = {
    val maxAbs = aggregate(transform(vec, v => abs(v.cast(DoubleType))),
      lit(0.0), (a, v) => greatest(a, v))
    val scale = when(maxAbs > 0, maxAbs / 127.0).otherwise(lit(0.0))
    struct(
      transform(vec, v =>
        when(scale > 0, round(v.cast(DoubleType) / scale).cast(ByteType))
          .otherwise(lit(0).cast(ByteType))).as("q"),
      scale.cast(FloatType).as("scale"))
  }

  /** Reconstruct approximate floats from the quantized struct. */
  def dequantizeInt8(qstruct: Column): Column =
    transform(qstruct.getField("q"),
      b => (b.cast(DoubleType) * qstruct.getField("scale").cast(DoubleType)).cast(FloatType))

  /** Approximate cosine directly on two quantized structs: the scales
    * cancel in the normalized dot product, so this is integer math over
    * the codes — no dequantization pass.
    */
  def cosineInt8(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast(DoubleType) * q.cast(DoubleType)),
        lit(0.0), (acc, v) => acc + v)
    def norm(x: Column): Column =
      sqrt(aggregate(transform(x, p => p.cast(DoubleType) * p.cast(DoubleType)),
        lit(0.0), (acc, v) => acc + v))
    val qa = a.getField("q")
    val qb = b.getField("q")
    dot(qa, qb) / (norm(qa) * norm(qb))
  }
}
