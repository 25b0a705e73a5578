package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IbanSpec extends SparkSpec {
  import spark.implicits._

  private def valid(s: String): Option[Boolean] = {
    val r = Seq(s).toDF("iban")
      .select(Iban.isValid(col("iban")).as("v")).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getBoolean(0))
  }

  test("the ISO 13616 reference IBANs verify; corrupted check digits fail") {
    // the two canonical examples from the standard's registry
    assert(valid("GB82WEST12345698765432").contains(true))
    assert(valid("DE89370400440532013000").contains(true))
    // a single flipped check digit must break the mod-97 proof
    assert(valid("GB83WEST12345698765432").contains(false))
    assert(valid("DE89370400440532013001").contains(false))
  }

  test("lower-case input verifies (transliteration upper-cases first)") {
    assert(valid("gb82west12345698765432").contains(true))
  }

  test("letter-heavy IBAN (45 transliterated digits) verifies via the fold") {
    // round-9 advisor: transliterated length = IBAN length + letter
    // count, so a letter-heavy BBAN overflows a single DECIMAL(38,0)
    // cast — the two-half 10^36≡64 fold must still verify it
    assert(valid("MT84MALT011000012345MTLCAST001S").contains(true))
    // and a flipped check digit must still fail on the fold path
    assert(valid("MT85MALT011000012345MTLCAST001S").contains(false))
  }

  test("non-alphanumeric chars yield NULL, never a false positive") {
    assert(valid("GB82 WEST 1234 5698 7654 32").isEmpty)
  }

  test("general isValid agrees with the structured q200 residue path") {
    val rows = graft.queries.AuditQueries.q200IbanAudit(spark, sf)
      .withColumn("viaFull", Iban.isValid(col("iban")).cast("int"))
      .filter(col("viaFull") =!= col("valid"))
    assert(rows.count() == 0,
      "full-IBAN rearrangement disagrees with the structured residue")
  }
}
