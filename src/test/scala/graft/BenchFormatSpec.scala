package graft

import org.scalatest.funsuite.AnyFunSuite

/** Failure honesty of the bench JSON (VERDICT r3 item 2): a thrown query
  * must surface as an `errors` entry and a nonzero `failed` count — it
  * must never silently shrink the total into a better-looking number. */
class BenchFormatSpec extends AnyFunSuite {

  test("all-green run emits failed:0 and an empty errors map") {
    val line = Bench.formatLine(Seq(
      Bench.QueryResult("q1", 0.5, None),
      Bench.QueryResult("q2", 1.25, None)), "/data/sf0.1")
    assert(line.contains("\"failed\":0"))
    assert(line.contains("\"errors\":{}"))
    assert(line.contains("\"q1\":0.5"))
    assert(line.contains("\"value\":1.75"))
  }

  test("forced failure shows up as an error entry and counts in the total") {
    val line = Bench.formatLine(Seq(
      Bench.QueryResult("q1", 0.5, None),
      Bench.QueryResult("qbad", 0.25, Some("AnalysisException"))), "/data/sf0.1")
    assert(line.contains("\"failed\":1"))
    assert(line.contains("\"errors\":{\"qbad\":\"AnalysisException\"}"))
    // elapsed-until-throw still contributes — failures can't deflate the total
    assert(line.contains("\"value\":0.75"))
  }

  test("env-controlled strings are escaped — a quoted path cannot break the line") {
    val line = Bench.formatLine(Seq(
      Bench.QueryResult("q1", 0.1, Some("Weird\"Exception\\Name"))),
      "/data/sf\"0.1\\x")
    assert(line.contains("\"sf\":\"/data/sf\\\"0.1\\\\x\""))
    assert(line.contains("\"errors\":{\"q1\":\"Weird\\\"Exception\\\\Name\"}"))
  }

  test("median block is additive and absent by default") {
    val rs = Seq(Bench.QueryResult("q1", 0.5, None))
    assert(!Bench.formatLine(rs, "/x").contains("median"))
    val line = Bench.formatLine(rs, "/x",
      Some(Seq("q1" -> 0.4, "q2" -> 1.0)))
    assert(line.contains("\"median_queries\":{\"q1\":0.4,\"q2\":1.0}"))
    assert(line.contains("\"median_total\":1.4"))
    // driver-contract fields untouched by the extra block
    assert(line.contains("\"value\":0.5") && line.contains("\"queries\":{"))
    assert(line.count(_ == '{') == line.count(_ == '}'))
  }

  test("calibration + builds blocks are additive and absent by default") {
    val rs = Seq(Bench.QueryResult("q1", 0.5, None))
    val bare = Bench.formatLine(rs, "/x")
    assert(!bare.contains("warmup_s") && !bare.contains("canary_s") &&
      !bare.contains("builds"))
    val line = Bench.formatLine(rs, "/x",
      warmupS = Some(12.5), canaryS = Some(0.8),
      builds = Some(Seq("classifier_train_score" -> 9.25,
        "pq_codebooks_encode" -> 3.0)))
    assert(line.contains("\"warmup_s\":12.5"))
    assert(line.contains("\"canary_s\":0.8"))
    assert(line.contains(
      "\"builds\":{\"classifier_train_score\":9.25,\"pq_codebooks_encode\":3.0}"))
    // driver-contract fields untouched by the extra blocks
    assert(line.contains("\"value\":0.5") && line.contains("\"queries\":{"))
    assert(line.count(_ == '{') == line.count(_ == '}'))
  }

  test("median: odd takes the middle run, even averages the two middles") {
    assert(Bench.median(Seq(3.18, 1.54, 1.72)) == 1.72)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
    assert(Bench.median(Seq(7.5)) == 7.5)
  }

  test("emitted line is parseable JSON with the driver's expected fields") {
    val line = Bench.formatLine(Seq(
      Bench.QueryResult("q1", 0.1, None),
      Bench.QueryResult("q2", 0.2, Some("SparkException"))), "/x")
    // minimal structural check without a JSON lib: balanced braces,
    // the driver-contract keys present, queries values numeric
    assert(line.count(_ == '{') == line.count(_ == '}'))
    for (k <- Seq("\"metric\":\"total\"", "\"unit\":\"sec\"",
        "\"queries\":{", "\"sf\":\"/x\""))
      assert(line.contains(k), s"missing $k in $line")
  }
}
