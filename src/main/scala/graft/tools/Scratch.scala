package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiling entry point (not part of the library surface). */
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

    time("shingles count")(
      uni.select(size(Dedup.shingles(col("text"))).as("n")).agg(sum("n")).collect())
    val withH = uni.select(col("doc_id").as("id"),
      Dedup.simhash(Dedup.shingles(col("text"), 5)).as("h")).persist()
    time("simhash compute")(withH.count())
    val blocks = withH.select(col("id"), explode(array((0 until 4).map(b =>
      concat_ws(":", lit(b.toString),
        shiftright(col("h"), b * 16).bitwiseAND(0xFFFFL).cast("string"))): _*)).as("block"))
    val counts = time("block histogram")(
      blocks.groupBy("block").count().orderBy(desc("count")).limit(10).collect())
    counts.foreach(r => println(s"[scratch] block ${r.get(0)} -> ${r.get(1)}"))
    val small = blocks.groupBy("block").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1 && col("n") <= 100).select("block")
    val kept = blocks.join(small, Seq("block"))
    val pairs = kept.select(col("block"), col("id").as("id_a"))
      .join(kept.select(col("block"), col("id").as("id_b")), Seq("block"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
    time("distinct pairs")(println(s"[scratch] n_pairs=${pairs.count()}"))
    val full = time("full simhashNearDupPairs")(
      Dedup.simhashNearDupPairs(uni, "text", "doc_id", maxDist = 12).count())
    println(s"[scratch] full=$full")
    spark.stop()
  }
}
