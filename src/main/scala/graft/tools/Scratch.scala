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

    val withH = graft.ops.Par.fanOut(uni).select(col("doc_id").as("id"),
      graft.functions.HashExprs.simhash64(Dedup.shingleHashes(col("text"), 5)).as("h")).persist()
    time("simhash compute (fanned)")(withH.count())
    time("simhash pairs given cached sigs") {
      // rebuild the tail of simhashNearDupPairs manually on the cached withH
      val blocks = withH.select(col("id"), explode(array((0 until 4).map(b =>
        concat_ws(":", lit(b.toString),
          shiftright(col("h"), b * 16).bitwiseAND(0xFFFFL).cast("string"))): _*)).as("block"))
      val small = blocks.groupBy("block").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1 && col("n") <= 100).select("block")
      val kept = blocks.join(small, Seq("block"))
      val pairs = kept.select(col("block"), col("id").as("id_a"))
        .join(kept.select(col("block"), col("id").as("id_b")), Seq("block"))
        .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
      val out = pairs
        .join(withH.select(col("id").as("id_a"), col("h").as("h_a")), Seq("id_a"))
        .join(withH.select(col("id").as("id_b"), col("h").as("h_b")), Seq("id_b"))
        .withColumn("dist", graft.dedup.Dedup.hamming(col("h_a"), col("h_b")))
        .filter(col("dist") <= 12).count()
      println(s"[scratch] pairs=$out")
    }
    time("full q33 e2e")(
      Dedup.simhashNearDupPairs(uni, "text", "doc_id", maxDist = 12).count())
    time("full q33 again")(
      Dedup.simhashNearDupPairs(uni, "text", "doc_id", maxDist = 12).count())
    spark.stop()
  }
}
