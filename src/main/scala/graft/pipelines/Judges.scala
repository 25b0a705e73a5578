package graft.pipelines

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Flow, Resource}
import graft.ops.Joins

/** The judges pipeline (reference: flows/judges.py) — judicial CVs →
  * events table. The SURVEY §7 minimum end-to-end slice: load → typed
  * cast → rename-join → flatMap generator → multi-resource package.
  *
  * Sources are injected DataFrames (the reference fetches
  * tribunals.json / judges.json / per-judge details over HTTP at import
  * time — here that's the caller's concern; see graft.sources.Rest).
  */
object Judges {

  /** Tribunal type recode (judges.py:26-43): type 1 keeps the tribunal's
    * own name; other codes map through the fixed Hebrew dictionary.
    */
  val tribunalTypeNames: Map[Int, String] = Map(
    2 -> "עליון", 3 -> "מחוזי", 4 -> "מיסים", 5 -> "השלום", 6 -> "נוער",
    7 -> "משפחה", 8 -> "תעבורה", 9 -> "אזורי לעבודה", 10 -> "ארצי לעבודה")

  final case class JudgeRow(
      Judge_ID: String, First_Name: String, Last_Name: String, CV: String)

  final case class JudgeEvent(
      Judge_ID: String, First_Name: String, Last_Name: String,
      event_id: String, event_datestring: String, event_description: String,
      event_order: Long)

  /** CV → 0..n events (judges.py:62-98). Stateful line scan per judge:
    *  - split each line at the LAST year-like (1900–2049) occurrence —
    *    note the reference treats a year at index 0 as "no split"
    *    (`if splitidx:` is falsy at 0), reproduced here;
    *  - dateless lines continue the previous event's description when one
    *    exists for the same judge, else open a dateless event;
    *  - classify via Hebrew verb lists → appointment/retirement/death
    *    (later categories win on multi-match, matching reference check
    *    order).
    */
  def parseCvEvents(j: JudgeRow): Seq[JudgeEvent] = {
    if (j.CV == null || j.CV.trim.isEmpty) return Seq.empty
    final case class Ev(var date: String, var desc: String)
    val events = scala.collection.mutable.ArrayBuffer.empty[Ev]
    for (line <- j.CV.split("\\r?\\n") if line.trim.nonEmpty) {
      var splitIdx: Option[Int] = None
      for (year <- 1900 until 2050) {
        val idx = line.indexOf(year.toString)
        if (idx > -1 && (splitIdx.isEmpty || splitIdx.get < idx)) splitIdx = Some(idx)
      }
      splitIdx match {
        case Some(i) if i != 0 => // reference falsy-0 quirk: idx 0 == no split
          events += Ev(line.substring(0, i + 4).trim, line.substring(i + 4).trim)
        case _ =>
          if (events.nonEmpty) events.last.desc += " " + line.trim
          else events += Ev("", line.trim)
      }
    }
    val appointment = Seq(
      "מונה ", "נבחר לכהונת", "נבחר לכהן", "עבר לכהן", "עברה לכהונ", "מכהן",
      "כיהן", "התמנה",
      "מונתה ", "נבחרה לכהונת", "נבחרה לכהן", "עברה לכהן", "מכהנת",
      "כיהנה", "התמנתה")
    val retirement = Seq("פרש לגימלה", "פרש לגימלאות", "פרשה לגימלה", "פרשה לגימלאות")
    val death = Seq("נפטר", "נפטרה")
    events.zipWithIndex.map { case (e, i) =>
      // reference checks the two attrs separately (judges.py:100-121) --
      // never concatenated, so a verb can't straddle the date/desc seam
      val attrs = Seq(e.date, e.desc)
      def hit(verbs: Seq[String]) = verbs.exists(v => attrs.exists(_.contains(v)))
      var id: String = null
      if (hit(appointment)) id = "appointment"
      if (hit(retirement)) id = "retirement"
      if (hit(death)) id = "death"
      JudgeEvent(j.Judge_ID, j.First_Name, j.Last_Name, id, e.date, e.desc, i.toLong)
    }.toSeq
  }

  /** Full pipeline: returns the three-resource package
    * (tribunals, judges_list, judge_events) — judges.py:128-152.
    */
  def run(
      spark: SparkSession,
      tribunals: DataFrame,
      judgesList: DataFrame): Flow.Ctx = {
    import spark.implicits._

    // set_type Is_In_Dimus_List boolean (judges.py:135)
    val typed = graft.ops.SetType.setType(
      judgesList, "Is_In_Dimus_List", BooleanType,
      onError = graft.ops.SetType.Nullify)

    // join tribunals into judges with renames (judges.py:137-143); the
    // tribunal dim is hundreds of rows -> broadcast
    val joined = Joins.joinResources(
      typed, tribunals,
      targetKeys = Seq("Tribunal_Code"), sourceKeys = Seq("Tribunal_Code"),
      fields = Map(
        "Tribunal_Type_Code" -> "Tribunal_Type_Code",
        "Arkaa_Code" -> "Tribunal_Arkaa_Code",
        "District_Code" -> "Tribunal_District_Code",
        "Name" -> "Tribunal_Name"),
      how = "left")

    // tribunal_type_name recode (judges.py:26-43)
    val typeMap = map(tribunalTypeNames.flatMap { case (k, v) =>
      Seq(lit(k), lit(v)) }.toSeq: _*)
    val recoded = joined.withColumn("tribunal_type_name",
      when(col("Tribunal_Type_Code").isNull, lit(null).cast(StringType))
        .when(col("Tribunal_Type_Code") === 1, col("Tribunal_Name"))
        .otherwise(element_at(typeMap, col("Tribunal_Type_Code").cast(IntegerType))))

    // CV -> events via typed flatMap (judges.py:46-125)
    val judgesDs: Dataset[JudgeRow] = recoded
      .select(
        col("Judge_ID").cast(StringType).as("Judge_ID"),
        col("First_Name").cast(StringType).as("First_Name"),
        col("Last_Name").cast(StringType).as("Last_Name"),
        col("CV").cast(StringType).as("CV"))
      .as[JudgeRow]
    val events = judgesDs.flatMap(parseCvEvents).toDF()

    Flow(
      Flow.resource(Resource(tribunals, "tribunals", path = Some("tribunals.csv"))),
      Flow.resource(Resource(recoded, "judges_list", path = Some("judges_list.csv"))),
      Flow.resource(Resource(events, "judge_events", path = Some("judge_events.csv"))))(Flow.empty)
  }
}
