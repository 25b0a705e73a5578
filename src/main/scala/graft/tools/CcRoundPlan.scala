package graft.graphs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: dump the physical plan of ONE alternation round of the
  * connected-components loop (smallStar ∘ largeStar over a toy edge
  * set). The loop materializes eagerly behind localCheckpoints, so the
  * round's plan never appears in a query-level explain — this is the
  * committed evidence for plans/rNN/cc_round_*.txt. */
object CcRoundPlan {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val round = ConnectedComponents.smallStar(
      ConnectedComponents.largeStar(edges))
    val plan = round.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      plan.getBytes("UTF-8"))
    println(s"[ccroundplan] $out")
    spark.stop()
  }
}
