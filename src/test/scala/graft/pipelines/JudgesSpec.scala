package graft.pipelines

import graft.SparkSpec

class JudgesSpec extends SparkSpec {
  import spark.implicits._

  test("parseCvEvents: year split, continuation, classification") {
    val cv = Seq(
      "מונה לשופט בבית המשפט המחוזי בשנת 1995",
      "המשך תיאור ללא שנה",
      "פרש לגימלאות 2020",
      "1999 שנה בתחילת שורה נחשבת ללא פיצול").mkString("\n")
    val events = Judges.parseCvEvents(Judges.JudgeRow("j1", "א", "ב", cv))
    assert(events.length == 2)
    // line 1 splits at 1995; line 2 (no year) continues event 1's description
    assert(events(0).event_datestring == "מונה לשופט בבית המשפט המחוזי בשנת 1995")
    assert(events(0).event_description.contains("המשך תיאור ללא שנה"))
    assert(events(0).event_id == "appointment")
    // line 3 splits at 2020 -> retirement
    assert(events(1).event_datestring == "פרש לגימלאות 2020")
    assert(events(1).event_id == "retirement")
    // line 4: year at index 0 is the reference's falsy-0 quirk -> it became
    // a continuation of event 2
    assert(events(1).event_description.contains("שנה בתחילת שורה"))
  }

  test("empty CV yields no events; dateless first line opens an event") {
    assert(Judges.parseCvEvents(Judges.JudgeRow("j", "a", "b", "")).isEmpty)
    assert(Judges.parseCvEvents(Judges.JudgeRow("j", "a", "b", null)).isEmpty)
    val ev = Judges.parseCvEvents(Judges.JudgeRow("j", "a", "b", "ללא שנה כלל"))
    assert(ev.length == 1 && ev(0).event_datestring == "")
  }

  test("full pipeline: join renames, type recode, events resource") {
    val tribunals = Seq(
      (4140, 9, 4101, 4000, "האזורי לעבודה באר שבע"),
      (5010, 1, 5001, 5000, "הנהלת בתי המשפט"))
      .toDF("Tribunal_Code", "Tribunal_Type_Code", "Arkaa_Code", "District_Code", "Name")
    val judges = Seq(
      ("1", "רות", "כהן", "true", 4140, "מונתה לשופטת בשנת 2001\nפרשה לגימלאות בשנת 2019"),
      ("2", "דוד", "לוי", "false", 5010, "נבחר לכהן 2005"),
      ("3", "שרה", "גל", "notabool", 9999, ""))
      .toDF("Judge_ID", "First_Name", "Last_Name", "Is_In_Dimus_List", "Tribunal_Code", "CV")

    val ctx = Judges.run(spark, tribunals, judges)
    assert(ctx.keySet == Set("tribunals", "judges_list", "judge_events"))

    val jl = ctx("judges_list").df.collect().map(r =>
      r.getAs[String]("Judge_ID") -> r).toMap
    // renamed join fields present
    assert(jl("1").getAs[String]("Tribunal_Name") == "האזורי לעבודה באר שבע")
    assert(jl("1").getAs[Int]("Tribunal_Arkaa_Code") == 4101)
    // type recode: code 9 -> fixed name; code 1 -> tribunal's own name
    assert(jl("1").getAs[String]("tribunal_type_name") == "אזורי לעבודה")
    assert(jl("2").getAs[String]("tribunal_type_name") == "הנהלת בתי המשפט")
    // unmatched tribunal -> nulls survive the left join
    assert(jl("3").getAs[String]("Tribunal_Name") == null)
    // boolean set_type with Nullify policy
    assert(jl("1").getAs[Boolean]("Is_In_Dimus_List"))
    assert(jl("3").isNullAt(jl("3").fieldIndex("Is_In_Dimus_List")))

    val ev = ctx("judge_events").df.orderBy("Judge_ID", "event_order").collect()
    assert(ev.length == 3)
    assert(ev.map(_.getAs[String]("event_id")).toSeq ==
      Seq("appointment", "retirement", "appointment"))
  }
}
