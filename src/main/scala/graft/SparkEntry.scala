package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query implementations live under graft.queries.*; each map entry
  * exercises one operator family from SURVEY.md §2 and (where
  * SQL-expressible) carries a DuckDB oracle with identical column names.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.MiscOps.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.ScrubQueries.queries ++
      graft.queries.CompositeQueries.queries ++
      graft.queries.SinkQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.SearchQueries.queries ++
      graft.queries.AuditQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.DedupQueries.oracles ++
      graft.queries.MiscOps.oracles ++
      graft.queries.PipelineQueries.oracles ++
      graft.queries.ScrubQueries.oracles ++
      graft.queries.CompositeQueries.oracles ++
      graft.queries.SinkQueries.oracles ++
      graft.queries.CurationQueries.oracles ++
      graft.queries.SearchQueries.oracles ++
      graft.queries.AuditQueries.oracles
}
