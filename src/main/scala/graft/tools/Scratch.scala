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

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val d = spark.read.parquet(s"$dir/documents.parquet")
    d.count() // warmup
    val bench = d.filter(col("doc_id") % 23 === 0)
    val training = d.filter(col("doc_id") % 23 =!= 0)

    import graft.functions.TextExprs
    for (i <- 1 to 2) {
      val benchHashes = bench
        .select(explode(TextExprs.wordGramHash64(col("text"), 5)).as("__gh"))
      val nG = time(s"bench gram count #$i")(benchHashes.count())
      val bloom = time(s"bloom build #$i")(
        benchHashes.stat.bloomFilter("__gh", math.max(nG, 1L), 0.05))
      println("[scratch]   bloom bits=" + bloom.bitSize())
      val ser = { val b = new java.io.ByteArrayOutputStream(); bloom.writeTo(b); b.toByteArray }
      println("[scratch]   ser bytes=" + ser.length)
      import org.apache.spark.sql.GraftBridge
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
      val mc = GraftBridge.column(BloomFilterMightContain(
        Literal(ser, org.apache.spark.sql.types.BinaryType),
        GraftBridge.expression(col("__gh"))))
      val cand = training
        .select(col("doc_id"), explode(TextExprs.wordGramHash64(col("text"), 5)).as("__gh"))
        .filter(mc).select("doc_id").distinct()
      time(s"tier1 candidates #$i")(println("[scratch]   cands=" + cand.count()))
      time(s"q57 full #$i")(println("[scratch]   out=" +
        graft.text.Decontaminate.overlapBloom(training, bench, "text", "doc_id", 5, 0.05).count()))
      time(s"q48-style full n=5 #$i")(println("[scratch]   out=" +
        graft.text.Decontaminate.overlap(training, bench, "text", "doc_id", 5).count()))
    }
    spark.stop()
  }
}
