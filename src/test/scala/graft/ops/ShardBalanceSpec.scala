package graft.ops

import graft.SparkSpec
import graft.queries.CurationQueries

/** q230's conservation and algebra invariants on the real sf0.001
  * corpus: every doc lands in exactly one shard (counts and mass
  * conserve), each row's deviation and straggler flag recompute from
  * its own mass and the derived total, and shard ids stay in [0, 16).
  */
class ShardBalanceSpec extends SparkSpec {

  test("q230: conservation, per-row algebra, shard domain") {
    val rows = CurationQueries.q230ShardBalance(spark, sf).collect()
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val nDocs = d.count()
    val totChars = d.selectExpr("sum(CAST(n_chars AS BIGINT))")
      .collect()(0).getLong(0)
    assert(rows.map(_.getLong(1)).sum == nDocs, "doc conservation")
    val total = rows.map(_.getLong(2)).sum
    assert(total == totChars, "mass conservation")
    rows.foreach { r =>
      val (shard, mass, dev, strag) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getInt(4))
      assert(shard >= 0 && shard < 16, s"shard domain: $shard")
      assert(dev == math.abs(16 * mass - total) * 1000 / total,
        s"dev algebra: $dev")
      assert(strag == (if (16 * mass * 1000 > 1050 * total) 1 else 0),
        "straggler flag")
    }
  }
}
