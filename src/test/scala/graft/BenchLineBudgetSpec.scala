package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the length budget of Bench's machine-readable last stdout line.
  *
  * The driver snapshots only the LAST 2000 chars of bench stdout and
  * parses the final JSON line out of that window; sbt's trailing
  * "[success] Total time: …" footer (~75 chars, measured across
  * BENCH_r07–r21 tails) sits between the line and the window's end. When
  * the suite grew from 150 to 152 queries in r20 the old spelling of the
  * line crossed the window and the head of the JSON fell outside it —
  * BENCH_r20/BENCH_r21 both recorded "parsed": null and the driver's
  * per-query PERF comparison ran blind for two rounds (r21 verdict,
  * "What's wrong" #1). This spec renders the line exactly as Bench does
  * — for the LIVE query set plus a growth margin of 12 future entries —
  * and fails at build time if the budget no longer holds, so the next
  * suite growth breaks a test instead of silently blinding the driver.
  */
class BenchLineBudgetSpec extends AnyFunSuite {
  // 2000-char stdout tail minus a conservative 100-char footer allowance
  private val window = 2000 - 100

  test("bench short line fits the driver's stdout tail for the live suite") {
    // worst realistic per-value width: every min floor just under 10 s
    // ("9.99" — no sf0.1 query has ever exceeded 4.3 s)
    val live = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 9.99)
    val line = Bench.shortLine("/root/testdata/sf0.1", 9999.99, live)
    assert(line.length <= window - 12 * 13,
      s"bench short line is ${line.length} chars for ${live.size} queries; " +
        s"budget is ${window - 12 * 13} (2000-char driver tail - 100 footer " +
        "- 12 future entries x 13 chars). Shrink the line (or re-derive the " +
        "budget) BEFORE shipping, or the driver's PERF pipeline goes blind " +
        "again like rounds 20-21.")
  }

  test("bench short line budget holds with 12 added queries") {
    val grown = (SparkEntry.queries.keys.toSeq ++
      (1 to 12).map(i => f"t9$i%02d_future_growth_entry")).sorted.map(_ -> 9.99)
    val line = Bench.shortLine("/root/testdata/sf0.1", 9999.99, grown)
    assert(line.length <= window,
      s"short line would be ${line.length} chars at ${grown.size} queries — " +
        "over the 1900-char safe window; the next suite growth would blind " +
        "the driver. Shrink the encoding now.")
  }

  test("short line is valid JSON shape with prefix keys and 2-decimal floors") {
    val line = Bench.shortLine("/root/testdata/sf0.1", 12.3456,
      Seq("t01_dedup_exact" -> 0.4567, "t99_x" -> -1.0))
    assert(line ==
      """{"total_min":12.35,"sf":"sf0.1","queries":{"t01":0.46,"t99":-1}}""")
  }
}
