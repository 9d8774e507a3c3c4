package graft

/** Whole-board plan-shape drift gate (VERDICT r7 item 4): recompute
  * every query's physical-plan fingerprint and compare against the
  * committed `PLAN_FINGERPRINTS.json` — the generalization of
  * PlanSpec's ~50 hand-pinned assertions to all queries. A failure
  * here means some query's plan gained/lost an exchange, changed join
  * strategy, stopped pushing filters, etc. If the change is
  * INTENTIONAL, refresh with `sbt "runMain graft.PlanFingerprints"`
  * and review the git diff of the artifact; if not, the diff below
  * names the drifted queries and keys. */
class PlanFingerprintSpec extends SparkSpec {

  test("committed plan fingerprints match the live board (refresh: runMain graft.PlanFingerprints)") {
    val committed = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("PLAN_FINGERPRINTS.json")), "UTF-8")
    val live = PlanFingerprints.render(
      PlanFingerprints.computeAll(spark, sf0001))
    if (live != committed) {
      val liveLines = live.split('\n')
      val fileLines = committed.split('\n')
      val diff = liveLines.zipAll(fileLines, "<missing>", "<missing>")
        .filter { case (a, b) => a != b }
        .take(12)
        .map { case (a, b) => s"  live: ${a.trim}\n  file: ${b.trim}" }
        .mkString("\n")
      fail("plan fingerprints drifted from PLAN_FINGERPRINTS.json " +
        "(intentional? re-run `sbt \"runMain graft.PlanFingerprints\"` " +
        s"and review the git diff):\n$diff")
    }
  }
}
