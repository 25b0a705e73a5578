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

  /** (idCol, n_windows, n_segments, speech_windows, speech_ratio_fix,
    * decode_ok) — speech_ratio as a 2^16 floor, NULL when there are no
    * windows (a ratio of nothing is not 0).
    *
    * No-silent-drop discipline: every input id surfaces. A VALID
    * zero-sample stream reports n_windows = 0 / decode_ok = 1; an
    * undecodable blob (bad container, truncated stream) routes through
    * the error policy ([[Multimodal.AudioCodec.tryEnergyWindows]]) and
    * reports decode_ok = 0 with zeroed counters — counted, never
    * vanished (the round-9 advisor hole: flatMap over energy windows
    * dropped both cases from the output entirely).
    */
  def silenceSegments(audio: DataFrame, idCol: String, blobCol: String,
      codec: Multimodal.AudioCodec, windowSamples: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("__id", LongType),
      StructField("widx", LongType),
      StructField("energy", LongType, nullable = true),
      StructField("__ok", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val blobIdx = 1
    val windows = audio
      .select(col(idCol).cast(LongType).as("__id"), col(blobCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          codec.tryEnergyWindows(r.get(blobIdx).asInstanceOf[Array[Byte]],
              windowSamples) match {
            case None => // undecodable: one sentinel row, decode_ok = 0
              Seq(Row(id, -1L, null, 0L))
            case Some(es) if es.isEmpty => // valid but empty stream
              Seq(Row(id, -1L, null, 1L))
            case Some(es) =>
              es.zipWithIndex.map { case (e, i) => Row(id, i.toLong, e, 1L) }
          }
        }
      }(enc)
    val w = Window.partitionBy("__id").orderBy("widx")
    val seg = windows
      .withColumn("__sil",
        when(col("energy").isNotNull, (col("energy") === 0L).cast("int")))
      .withColumn("__chg",
        when(col("__sil").isNull, 0L)
          .when(col("__sil") === lag("__sil", 1).over(w), 0L).otherwise(1L))
    seg.groupBy("__id")
      .agg(sum(when(col("energy").isNotNull, 1L).otherwise(0L))
          .as("n_windows"),
        sum("__chg").as("n_segments"),
        coalesce(sum(lit(1L) - col("__sil")), lit(0L)).as("speech_windows"),
        min("__ok").as("decode_ok"))
      .withColumn("speech_ratio_fix",
        when(col("n_windows") > 0, expr(
          "(CAST(speech_windows AS DECIMAL(38,0)) * 65536) div n_windows")
          .cast("long")))
      .select(col("__id").as(idCol), col("n_windows"), col("n_segments"),
        col("speech_windows"), col("speech_ratio_fix"), col("decode_ok"))
  }
}
