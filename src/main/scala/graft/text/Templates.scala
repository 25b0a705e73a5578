package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cluster template extraction — given near-dup clusters (LSH
  * components, crawl replica sets, form letters), recover the shared
  * PREFIX template: the boilerplate that makes the cluster a cluster.
  * Feeds the boilerplate-strip / dedup-explain tier: the template is
  * what you subtract to see what a member actually says.
  *
  * The whole trick is one algebraic identity: the common prefix of a
  * SET of strings equals the common prefix of its lexicographic MIN
  * and MAX alone (any mismatch between some pair surfaces as a
  * mismatch between the extremes at the same position or earlier). min
  * and max are map-side-combinable aggregates, so the corpus collapses
  * in ONE exchange and the LCP itself runs on two strings per cluster.
  *
  * The LCP is computed by counting positions i where the two prefixes
  * of length i agree — prefix equality is MONOTONE in i, so the count
  * IS the longest match (no early-exit logic to replicate); both
  * engines express it with the same builtin HOF one-liner. Cost is
  * O(L²) char compares on TWO strings per cluster — fine for documents;
  * swap in a binary-search kernel if templates reach megabytes.
  */
object Templates {

  /** @return (clusterCol, n_members, template_len, template) */
  def clusterPrefix(df: DataFrame, clusterCol: String,
      textCol: String): DataFrame =
    df.groupBy(clusterCol)
      .agg(count(lit(1)).as("n_members"),
        min(col(textCol)).as("__lo"), max(col(textCol)).as("__hi"))
      // Spark's sequence(1, 0) steps DOWN to [1, 0] instead of being
      // empty — the zero-length case needs an explicit guard
      .withColumn("template_len",
        expr("""CASE WHEN least(length(__lo), length(__hi)) < 1 THEN 0
               |ELSE size(filter(sequence(1, int(least(length(__lo), length(__hi)))),
               |i -> substr(__lo, 1, i) = substr(__hi, 1, i))) END""".stripMargin)
          .cast("long"))
      .withColumn("template",
        expr("substr(__lo, 1, int(template_len))"))
      .select(col(clusterCol), col("n_members"), col("template_len"),
        col("template"))
}
