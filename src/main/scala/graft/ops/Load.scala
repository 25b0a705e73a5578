package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S1 `load` — source loading with the reference's option surface
  * (reference: organisations.py:57, publications.py:86-91, i18n.py:54).
  *
  * Frictionless options → Spark reader options:
  *   - headers            → header=true
  *   - INFER_STRINGS /
  *     CAST_TO_STRINGS    → inferSchema=false (all columns arrive string;
  *                          types applied in-flow via SetType, matching the
  *                          reference where every cast is an explicit step)
  *   - encoding           → encoding
  *   - schema (descriptor) → explicit StructType, inference skipped
  *
  * Every ordered load stamps `__ord` (see Ordering) because downstream
  * order-sensitive ops need arrival order.
  */
object Load {

  def csv(
      spark: SparkSession,
      path: String,
      header: Boolean = true,
      inferStrings: Boolean = true,
      encoding: String = "UTF-8",
      schema: Option[StructType] = None,
      stampOrd: Boolean = true): DataFrame = {
    var r = spark.read
      .option("header", header)
      .option("encoding", encoding)
      .option("multiLine", true)
      .option("escape", "\"")
    r = schema match {
      case Some(s) => r.schema(s)
      case None    => r.option("inferSchema", !inferStrings)
    }
    val df = r.csv(path)
    if (stampOrd) Ordering.stampOrder(df) else df
  }

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC — the other columnar format Spark ships natively; same
    * predicate-pushdown/column-pruning machinery as parquet.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def json(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("multiLine", true)
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** Star-schema test tables (`/root/testdata/sf*`): one parquet per table. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events` — normalize the stream table to the two columns every
    * event-time query consumes, regardless of how the parquet writer
    * encoded time:
    *   - `ts`    TimestampType (session-tz instant; sessions run UTC)
    *   - `ts_ns` BIGINT nanoseconds since epoch (exact integer arithmetic
    *             for gap/interval math — no float round-trips)
    *
    * Physical encodings seen across testdata generations:
    *   - TIMESTAMP(NANOS): Spark reads it only as BIGINT via
    *     spark.sql.legacy.parquet.nanosAsLong → derive `ts` from the long
    *   - timestamp[us] (isAdjustedToUTC either way): Spark reads
    *     TimestampType or TimestampNTZType → derive `ts_ns` from it
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          // integer division: `/` on longs is DOUBLE division, which ROUNDS
          // near-microsecond values up while every other engine truncates —
          // a 1µs skew that breaks exact-time oracles (caught by q72)
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case TimestampType =>
        raw.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType =>
        // naive timestamp = UTC by contract (sessions pin UTC), same as
        // DuckDB's epoch_ns on the identical parquet
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected BIGINT nanos or a timestamp")
    }
  }
}
