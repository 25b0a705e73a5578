package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.graphs.ConnectedComponents
import graft.ops.Load
import graft.text.{Decontaminate, Scrub}

/** Corpus-curation queries: near-dup cluster formation (connected
  * components), benchmark decontamination, and per-source cap sampling —
  * the keep/drop machinery that sits between pair-finding (DedupQueries)
  * and the final training mix.
  */
object CurationQueries {

  /** Connected components over a deterministic multi-hop graph: nation
    * "star" edges (customer → its nation hub) unioned with "chain" edges
    * from orders (custkey → custkey+1) that bridge some stars. 570
    * nodes, 40 components, largest 30 and several hops deep at sf0.01 —
    * exercises transitive merging, not just clique labeling. The oracle
    * is an independent DuckDB recursive-CTE transitive closure.
    */
  def q47Components(spark: SparkSession, dir: String): DataFrame = {
    val customer = Load.table(spark, dir, "customer")
    val orders = Load.table(spark, dir, "orders")
    val stars = customer.filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").cast(LongType).as("a"),
        (col("c_nationkey").cast(LongType) + 10000000L).as("b"))
    val chains = orders.filter(col("o_orderkey") % 500 === 0)
      .select(col("o_custkey").cast(LongType).as("a"),
        (col("o_custkey").cast(LongType) + 1L).as("b"))
    ConnectedComponents.components(stars.unionByName(chains))
      .orderBy("id")
  }

  val q47Sql: String =
    """WITH RECURSIVE e AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS a, CAST(10000000 + c_nationkey AS BIGINT) AS b
      |  FROM customer WHERE c_custkey % 3 = 0
      |  UNION ALL
      |  SELECT CAST(o_custkey AS BIGINT), CAST(o_custkey + 1 AS BIGINT)
      |  FROM orders WHERE o_orderkey % 500 = 0
      |), ue AS (
      |  SELECT a, b FROM e UNION SELECT b, a FROM e
      |  UNION SELECT a, a FROM e UNION SELECT b, b FROM e
      |), reach(s, t) AS (
      |  SELECT a, b FROM ue
      |  UNION
      |  SELECT r.s, u.b FROM reach r JOIN ue u ON r.t = u.a
      |)
      |SELECT s AS id, min(t) AS component FROM reach
      |GROUP BY s ORDER BY id""".stripMargin

  /** Benchmark decontamination: docs with doc_id % 23 = 0 play the
    * held-out benchmark; every other doc is flagged with its count of
    * distinct leaked word 4-grams (4, not the 13 of web-scale practice,
    * because the synthetic vocabulary is ~30 words — the parameter is
    * the point, the mechanics are identical).
    */
  def q48Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val d = Load.table(spark, dir, "documents")
    val bench = d.filter(col("doc_id") % 23 === 0)
    val training = d.filter(col("doc_id") % 23 =!= 0)
    Decontaminate.overlap(training, bench, "text", "doc_id", n = 4)
      .orderBy("doc_id")
  }

  val q48Sql: String =
    """WITH grams AS (
      |  SELECT doc_id, array_to_string(w[i:i+3], ' ') AS gram
      |  FROM (SELECT doc_id,
      |          list_filter(string_split_regex(lower(text), '\s+'),
      |                      x -> x <> '') AS w
      |        FROM documents),
      |       UNNEST(generate_series(1, len(w) - 3)) AS t(i)
      |  WHERE len(w) >= 4
      |)
      |SELECT t.doc_id, count(DISTINCT t.gram) AS n_hit_grams
      |FROM grams t
      |JOIN (SELECT DISTINCT gram FROM grams WHERE doc_id % 23 = 0) b USING (gram)
      |WHERE t.doc_id % 23 <> 0
      |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  /** Per-source cap: keep ≤ 10 docs per source, chosen by the stable
    * md5(doc_id) draw — the domain-capping step of a training mix. Runs
    * through the TopKPerKey bounded-heap operator; the oracle is the
    * window row_number formulation it replaces.
    */
  def q49DomainCap(spark: SparkSession, dir: String): DataFrame = {
    val d = Load.table(spark, dir, "documents")
      .select("doc_id", "source", "n_chars")
    Scrub.capPerKey(d, "source", "doc_id", cap = 10)
      .select("source", "doc_id", "n_chars")
      .orderBy("source", "doc_id")
  }

  val q49Sql: String =
    """SELECT source, doc_id, n_chars FROM (
      |  SELECT source, doc_id, n_chars,
      |         row_number() OVER (PARTITION BY source
      |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents) WHERE rn <= 10
      |ORDER BY source, doc_id""".stripMargin

  /** Vocabulary statistics: global token counts + document frequency,
    * top 100 by count — the corpus pass behind tokenizer/vocab builds
    * and stopword derivation. Classic wordcount shape: explode → partial
    * (map-side) aggregation → final agg; the top-100 runs as
    * TakeOrderedAndProject (per-partition heads merged on the driver),
    * never a global sort.
    */
  def q52Vocab(spark: SparkSession, dir: String): DataFrame = {
    val d = Load.table(spark, dir, "documents")
    d.select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("total_count"),
        count_distinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("total_count").desc, col("token"))
      .limit(100)
  }

  val q52Sql: String =
    """SELECT token, count(*) AS total_count,
      |       count(DISTINCT doc_id) AS doc_freq
      |FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
      |      FROM documents)
      |WHERE token <> ''
      |GROUP BY token ORDER BY total_count DESC, token LIMIT 100""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_components" -> (q47Components _),
    "q48_decontaminate" -> (q48Decontaminate _),
    "q49_domain_cap" -> (q49DomainCap _),
    "q52_vocab" -> (q52Vocab _))

  val oracles: Map[String, String] = Map(
    "q47_components" -> q47Sql,
    "q48_decontaminate" -> q48Sql,
    "q49_domain_cap" -> q49Sql,
    "q52_vocab" -> q52Sql)
}
