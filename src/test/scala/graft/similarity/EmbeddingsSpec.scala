package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select("vec_id", "embedding").limit(200)

  test("l2Normalize produces unit vectors, direction preserved") {
    val out = emb.select(
      Ann.cosine($"embedding", Embeddings.l2Normalize($"embedding")).as("c"),
      aggregate(transform(Embeddings.l2Normalize($"embedding"),
        v => v.cast("double") * v.cast("double")), lit(0.0), (a, v) => a + v).as("n2"))
      .collect()
    out.foreach { r =>
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-6, "direction changed")
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-6, s"norm^2 = ${r.getDouble(1)}")
    }
  }

  test("int8 quantize/dequantize round-trip keeps cosine within 1%") {
    val out = emb.select(
      Ann.cosine($"embedding",
        Embeddings.dequantizeInt8(Embeddings.quantizeInt8($"embedding"))).as("c"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) > 0.99, s"cosine ${r.getDouble(0)}"))
  }

  test("cosineInt8 approximates float cosine across pairs") {
    val a = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("ia"), $"embedding".as("va"),
        Embeddings.quantizeInt8($"embedding").as("qa"))
    val b = emb.filter($"vec_id" >= 10 && $"vec_id" < 20)
      .select($"vec_id".as("ib"), $"embedding".as("vb"),
        Embeddings.quantizeInt8($"embedding").as("qb"))
    val rows = a.crossJoin(b).select(
      Ann.cosine($"va", $"vb").as("exact"),
      Embeddings.cosineInt8($"qa", $"qb").as("approx")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.02,
        s"exact ${r.getDouble(0)} vs int8 ${r.getDouble(1)}")
    }
  }

  test("two-tier int8TopK recovers the exact float top-k") {
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val q = all.filter($"vec_id" < 10)
    val exact = Ann.bruteForceTopK(all, q, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val twoTier = Ann.int8TopK(all, q, "vec_id", "embedding", k = 3, candidateFactor = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & twoTier).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 two-tier recall $recall")
  }

  test("quantized struct is schema-stable (array<tinyint> + float scale)") {
    val schema = emb.select(Embeddings.quantizeInt8($"embedding").as("q")).schema
    val st = schema("q").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(st("q").dataType.simpleString == "array<tinyint>")
    assert(st("scale").dataType.simpleString == "float")
  }
}
