package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Video scene segmentation + cross-video dedup — the temporal tier of
  * the multimodal stack, above [[ImageDedup]]'s per-image pHash: a
  * video is an ordered array of opaque frame blobs; consecutive frames
  * with the SAME perceptual hash collapse into a scene (run-length
  * over the frame timeline — the "static shot" compression every
  * frame-level pipeline needs before it pays per-frame inference), and
  * videos whose full scene-hash SEQUENCE agrees are duplicates (the
  * re-upload/mirror case).
  *
  * Scale shape, in order:
  *   1. frame explode is NARROW (per-row fan-out bounded by the frame
  *      count) and features are computed immediately — blobs NEVER
  *      cross an exchange, 8-byte pHashes do;
  *   2. the run-length lag window, the per-scene rollup, and the
  *      per-video rollup all ride ONE video-keyed exchange;
  *   3. dup grouping keys a second exchange on the 16-byte sequence
  *      fingerprint — the same hash-only discipline as exact text
  *      dedup (q30).
  *
  * At 100 TB: scenes/video is bounded (frame sampling upstream), so
  * per-video state is bounded; a degenerate fingerprint bucket (e.g.
  * millions of all-black clips) caps exactly like the LSH buckets.
  */
object VideoDedup {

  /** Per-video scene summary + duplicate group size:
    * (idCol, n_frames, n_segments, n_bad_frames, dup_group_size).
    *
    * No-silent-drop discipline: EVERY input video surfaces —
    * `posexplode_outer` keeps empty/NULL frame arrays (reported with
    * n_frames = 0, n_segments = 0), and an undecodable frame yields
    * null features under the error policy
    * ([[Multimodal.withImageFeaturesLenient]]) and is COUNTED in
    * n_bad_frames while the scene run-length carries on across it
    * (`last(_, ignoreNulls)` — a corrupt frame inside a static shot
    * doesn't split the shot). n_frames counts DECODABLE frames; the
    * sequence fingerprint covers decodable scenes only, so a replica
    * with the same planted corruption still dedups. Videos with no
    * decodable content share the empty fingerprint (identical — empty
    * — scene sequences) and dup-group together; filter n_frames = 0
    * first if that grouping is unwanted.
    */
  def sceneSummary(videos: DataFrame, idCol: String, framesCol: String,
      decoder: Multimodal.Decoder): DataFrame = {
    val frames = videos.select(col(idCol),
      posexplode_outer(col(framesCol)).as(Seq("fidx", "__frame")))
    // feature BEFORE any wide op: only (id, fidx, phash, present)
    // survives — blobs never cross an exchange
    val feat = Multimodal.withImageFeaturesLenient(frames, "__frame", decoder)
      .select(col(idCol), col("fidx"),
        col("image_features.phash").as("__ph"),
        col("__frame").isNotNull.as("__present"))
    val w = Window.partitionBy(idCol).orderBy("fidx")
    val seg = feat
      // previous DECODABLE hash: bad frames are transparent to the
      // run-length (ignoreNulls skips them), empty arrays have no rows
      // with a hash at all
      .withColumn("__prev", last("__ph", ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__chg",
        when(col("__ph").isNull, 0L)
          .when(col("__ph") === col("__prev"), 0L).otherwise(1L))
      .withColumn("__run", sum("__chg").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // null scene id for bad frames + array placeholders: they carry
      // counters below but never join a scene
      .withColumn("__seg", when(col("__ph").isNotNull, col("__run")))
    val perScene = seg.groupBy(col(idCol), col("__seg"))
      .agg(sum(when(col("__ph").isNotNull, 1L).otherwise(0L)).as("__len"),
        sum(when(col("__present") && col("__ph").isNull, 1L).otherwise(0L))
          .as("__bad"),
        max("__ph").as("__sph"))
    val perVideo = perScene.groupBy(col(idCol))
      .agg(sum("__len").as("n_frames"),
        sum(when(col("__seg").isNotNull, 1L).otherwise(0L)).as("n_segments"),
        sum("__bad").as("n_bad_frames"),
        // order-pinned sequence fingerprint: array_sort on the struct
        // sorts by __seg (unique per video), then the hash covers
        // (scene hash, scene LENGTH) pairs IN TIMELINE ORDER — a
        // 3-frame shot of X is not the same video as a 1-frame flash
        // of X, and a reordered timeline is not the same video either.
        // collect_list skips the NULL the `when` emits for the null-seg
        // group, so bad frames and placeholders never enter the hash.
        md5(array_join(transform(
          array_sort(collect_list(when(col("__seg").isNotNull,
            struct(col("__seg").as("s"),
              col("__sph").as("p"), col("__len").as("l"))))),
          x => concat_ws(":", x.getField("p").cast("string"),
            x.getField("l").cast("string"))), ",").cast("binary"))
          .as("__fp"))
    perVideo
      .withColumn("dup_group_size",
        count(lit(1)).over(Window.partitionBy("__fp")))
      .select(col(idCol), col("n_frames"), col("n_segments"),
        col("n_bad_frames"), col("dup_group_size"))
  }
}
