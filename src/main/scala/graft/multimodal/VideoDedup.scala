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
    * (idCol, n_frames, n_segments, dup_group_size).
    */
  def sceneSummary(videos: DataFrame, idCol: String, framesCol: String,
      decoder: Multimodal.Decoder): DataFrame = {
    val frames = videos.select(col(idCol),
      posexplode(col(framesCol)).as(Seq("fidx", "__frame")))
    // feature BEFORE any wide op: only (id, fidx, phash) survives
    val feat = Multimodal.withImageFeatures(frames, "__frame", decoder)
      .select(col(idCol), col("fidx"),
        col("image_features.phash").as("__ph"))
    val w = Window.partitionBy(idCol).orderBy("fidx")
    val seg = feat
      .withColumn("__chg",
        when(col("__ph") === lag("__ph", 1).over(w), 0L).otherwise(1L))
      .withColumn("__seg", sum("__chg").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perScene = seg.groupBy(col(idCol), col("__seg"))
      .agg(count(lit(1)).as("__len"), max("__ph").as("__sph"))
    val perVideo = perScene.groupBy(col(idCol))
      .agg(sum("__len").as("n_frames"),
        count(lit(1)).as("n_segments"),
        // order-pinned sequence fingerprint: array_sort on the struct
        // sorts by __seg (unique per video), then the hash covers
        // (scene hash, scene LENGTH) pairs IN TIMELINE ORDER — a
        // 3-frame shot of X is not the same video as a 1-frame flash
        // of X, and a reordered timeline is not the same video either
        md5(array_join(transform(
          array_sort(collect_list(struct(col("__seg").as("s"),
            col("__sph").as("p"), col("__len").as("l")))),
          x => concat_ws(":", x.getField("p").cast("string"),
            x.getField("l").cast("string"))), ",").cast("binary"))
          .as("__fp"))
    perVideo
      .withColumn("dup_group_size",
        count(lit(1)).over(Window.partitionBy("__fp")))
      .select(col(idCol), col("n_frames"), col("n_segments"),
        col("dup_group_size"))
  }
}
