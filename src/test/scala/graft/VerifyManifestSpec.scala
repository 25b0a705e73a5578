package graft

import org.scalatest.funsuite.AnyFunSuite

/** The verify manifest's crash-safety contract: flat-JSON round-trip
  * through the same escaper the writer uses, merge semantics (children
  * extend, later statuses win), and corrupt-input degradation to empty
  * rather than an abort — the partial artifact must survive anything.
  */
class VerifyManifestSpec extends AnyFunSuite {

  test("parseFlatJson round-trips escaped keys and values") {
    val s = """{"q1_agg": "ok", "weird\nname\t\"x\"": "error", "u": ""}"""
    val m = Verify.parseFlatJson(s)
    assert(m("q1_agg") == "ok")
    assert(m("weird\nname\t\"x\"") == "error")
    assert(m("u") == "")
  }

  test("parseFlatJson degrades to empty on garbage, never throws") {
    assert(Verify.parseFlatJson("") == Map.empty)
    assert(Verify.parseFlatJson("{\"truncated\": \"o") == Map.empty)
    assert(Verify.parseFlatJson("not json at all") == Map.empty)
  }

  test("parseFlatJson bails on a missing colon instead of looping forever") {
    // round-11 advice: indexOf(':', afterK) == -1 made indexOf('"', -1)
    // rescan from 0 and the loop stopped advancing — a hang, not a parse
    // failure. Must return empty promptly.
    val t = new Thread(() => assert(Verify.parseFlatJson("{\"k\" \"v\"}") == Map.empty))
    t.setDaemon(true); t.start(); t.join(5000)
    assert(!t.isAlive, "parseFlatJson hung on colon-less input")
    // colon present but BEFORE the key's end was already impossible via
    // the writer; still, a colon with no following quote must degrade too
    assert(Verify.parseFlatJson("{\"k\": 12}") == Map.empty)
  }

  test("manifest merge: children extend, later statuses win") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-manifest-spec").toString
    // simulate tranche-0 child writes, a parent "died" mark, then a rerun
    Verify.mergeManifest(dir, Seq("qa" -> "ok", "qb" -> "ok"))
    Verify.mergeManifest(dir, Seq("qc" -> "died"))
    Verify.mergeManifest(dir, Seq("qc" -> "ok")) // rerun: status replaced
    val m = Verify.parseFlatJson(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/manifest.json")))
    assert(m == Map("qa" -> "ok", "qb" -> "ok", "qc" -> "ok"))
  }
}
