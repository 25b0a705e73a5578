package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Image near-duplicate detection — the two-tier shape the text dedup
  * tiers use (MinHash→Jaccard, SimHash→verify), applied to pixels:
  *
  *   tier 1 (blocking): decode the corpus ONCE into 64-bit perceptual
  *     hashes ([[Multimodal.Decoder.imageFeatures]] DCT pHash) and
  *     self-join on pHash EQUALITY — only (phash, id) pairs ever cross
  *     the shuffle, never pixels or blobs;
  *   tier 2 (verify): re-decode CANDIDATE ids only and require the exact
  *     integer pixel checksum ([[Multimodal.Decoder.pixelStats]]) to
  *     agree, so a pHash collision between visually-close-but-different
  *     images cannot produce a false pair.
  *
  * At 100 TB the blob column never shuffles: tier 1 ships 16 bytes per
  * image, tier 2 re-reads blobs for the (rare) candidates via an id
  * join. A degenerate pHash bucket (e.g. millions of black frames) is
  * capped the way the LSH tier caps buckets — noted here, not needed at
  * the tested scales.
  */
object ImageDedup {

  /** (id_a, id_b) pairs of images with equal pHash AND equal exact pixel
    * checksums, id_a < id_b.
    */
  def phashDupPairs(
      media: DataFrame,
      idCol: String,
      blobCol: String,
      decoder: Multimodal.Decoder): DataFrame = {
    val ph = Multimodal.withImageFeatures(media, blobCol, decoder)
      .select(col(idCol), col("image_features.phash").as("__ph"))
    val a = ph.select(col("__ph"), col(idCol).as("id_a"))
    val b = ph.select(col("__ph"), col(idCol).as("id_b"))
    val cand = a.join(b, Seq("__ph"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    // tier 2: decode only ids that appear in some candidate pair
    val candIds = cand
      .select(explode(array(col("id_a"), col("id_b"))).as(idCol))
      .distinct()
    val stats = Multimodal
      .withPixelStats(media.join(candIds, Seq(idCol)), blobCol, decoder)
      .select(col(idCol), col("pixel_stats").as("__st"))
    cand
      .join(stats.select(col(idCol).as("id_a"), col("__st").as("__sa")), Seq("id_a"))
      .join(stats.select(col(idCol).as("id_b"), col("__st").as("__sb")), Seq("id_b"))
      .filter(col("__sa") === col("__sb"))
      .select("id_a", "id_b")
  }
}
