package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LuhnSpec extends SparkSpec {
  import spark.implicits._

  private def valid(ss: String*): Seq[Boolean] =
    ss.toDF("s").select(Scrub.luhnValid(col("s"))).collect()
      .map(_.getBoolean(0)).toSeq

  test("known card numbers validate; off-by-one digits do not") {
    // the classic public test numbers
    assert(valid("4111111111111111", "5500005555555559", "378282246310005")
      == Seq(true, true, true))
    assert(valid("4111111111111112", "5500005555555550", "378282246310006")
      == Seq(false, false, false))
  }

  test("the length gate rejects short and long digit runs") {
    // "59" is Luhn-clean but far too short to be a card
    assert(valid("59", "4111111111111111000000") == Seq(false, false))
  }

  test("separators are ignored: spaced and dashed forms validate") {
    assert(valid("4111 1111 1111 1111", "4111-1111-1111-1111")
      == Seq(true, true))
  }

  test("luhnSum matches the scalar definition on random digit strings") {
    def ref(s: String): Int = {
      val ds = s.filter(_.isDigit).reverse.map(_.asDigit)
      ds.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 1) { val x = 2 * d; if (x > 9) x - 9 else x } else d
      }.sum
    }
    val ss = (1 to 30).map(i => ((i * 2654435761L) % 100000000000000L).toString)
    val got = ss.toDF("s").select(Scrub.luhnSum(col("s"))).collect()
      .map(_.getInt(0)).toSeq
    assert(got == ss.map(ref))
  }
}
