package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only plan inspection / profiling entry point (not library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    import graft.dedup.Dedup

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val mutated = d.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" appended tail marker")).as("text"))
    val uni = d.unionByName(mutated)

    uni.count() // warmup

    // old-style tail (count-filter + semi-join + self-join) vs candidatePairs
    val withSig = graft.ops.Par.fanOut(uni)
      .select(col("doc_id").as("id"), Dedup.shingleHashes(col("text"), 5).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", Dedup.minhashSignatureFromHashes(col("sh"), 64))
      .drop("sh")
      .persist()
    withSig.count()
    val buckets = withSig
      .select(col("id"), explode(Dedup.lshBucketKeys(col("sig"), 64, 16)).as("bucket"))

    def oldPairs() = {
      val small = buckets.groupBy("bucket").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1 && col("n") <= 100).select("bucket")
      val kept = buckets.join(small, Seq("bucket"))
      kept.select(col("bucket"), col("id").as("id_a"))
        .join(kept.select(col("bucket"), col("id").as("id_b")), Seq("bucket"))
        .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
    }
    for (i <- 1 to 2) {
      time(s"pairs OLD tail #$i")(println("[scratch]   n=" + oldPairs().count()))
      time(s"pairs NEW tail #$i")(println("[scratch]   n=" + Dedup.candidatePairs(buckets, 100).count()))
    }
    // pair-set equality
    val diff = oldPairs().exceptAll(Dedup.candidatePairs(buckets, 100)).count() +
      Dedup.candidatePairs(buckets, 100).exceptAll(oldPairs()).count()
    println(s"[scratch] pair-set diff old vs new = $diff")

    for (i <- 1 to 2) {
      time(s"q32 cold e2e #$i")(
        Dedup.minhashNearDupPairs(uni, "text", "doc_id", threshold = 0.5).count())
      time(s"q34 cold e2e #$i")(
        Dedup.ngramJaccardPairs(uni, "text", "doc_id", threshold = 0.7).count())
      time(s"q33 cold e2e #$i")(
        Dedup.simhashNearDupPairs(uni, "text", "doc_id", maxDist = 12).count())
    }
    spark.stop()
  }
}
