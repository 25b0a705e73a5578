package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Voice-activity segmentation — the audio twin of [[VideoDedup]]'s
  * temporal tier: a recording becomes per-window integer energies
  * (decode ONCE, narrow), energy-0 windows are digital silence, and
  * consecutive same-state windows collapse into talk/silence segments
  * (the VAD pass every speech pipeline runs before per-segment ASR
  * cost). Integer-exact by construction: the 16-bit grid makes "all
  * samples exactly zero" a bit-deterministic predicate — no float
  * threshold to drift across engines.
  *
  * Scale shape: the blob decodes in the SAME narrow stage that emits
  * (id, widx, energy) — audio bytes never reach an exchange; the lag
  * window, segment rollup, and ratio all ride ONE id-keyed exchange;
  * per-audio state is bounded by windows/duration.
  */
object AudioSegments {

  /** (idCol, n_windows, n_segments, speech_windows, speech_ratio_fix)
    * — speech_ratio as a 2^16 floor.
    */
  def silenceSegments(audio: DataFrame, idCol: String, blobCol: String,
      codec: Multimodal.AudioCodec, windowSamples: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("__id", LongType),
      StructField("widx", LongType),
      StructField("energy", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val blobIdx = 1
    val windows = audio
      .select(col(idCol).cast(LongType).as("__id"), col(blobCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          codec.energyWindows(r.get(blobIdx).asInstanceOf[Array[Byte]],
              windowSamples)
            .zipWithIndex.map { case (e, i) => Row(r.getLong(0), i.toLong, e) }
        }
      }(enc)
    val w = Window.partitionBy("__id").orderBy("widx")
    val seg = windows
      .withColumn("__sil", (col("energy") === 0L).cast("int"))
      .withColumn("__chg",
        when(col("__sil") === lag("__sil", 1).over(w), 0L).otherwise(1L))
    seg.groupBy("__id")
      .agg(count(lit(1)).as("n_windows"),
        sum("__chg").as("n_segments"),
        sum(lit(1L) - col("__sil")).as("speech_windows"))
      .withColumn("speech_ratio_fix",
        expr("(CAST(speech_windows AS DECIMAL(38,0)) * 65536) div n_windows")
          .cast("long"))
      .select(col("__id").as(idCol), col("n_windows"), col("n_segments"),
        col("speech_windows"), col("speech_ratio_fix"))
  }
}
