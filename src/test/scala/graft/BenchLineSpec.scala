package graft

import org.scalatest.funsuite.AnyFunSuite

/** ADVICE r17 #4: the driver parses the bench JSON out of the LAST
  * ~1800 chars of stdout (2000-char tail window minus trailing Spark
  * shutdown noise), so a stdout line that outgrows it regresses to the
  * BENCH_r01..r04 `parsed: null` failure mode. The greedy slowest-query
  * cap self-limits, but the fixed per-line overhead (prefix fields,
  * errors array) grows with the surface — this spec renders the line
  * from synthetic result maps bigger and uglier than any real sweep so
  * surface growth trips a named test instead of a silent driver parse
  * failure.
  */
class BenchLineSpec extends AnyFunSuite {

  private def render(n: Int, nFailed: Int): String = {
    val mins = (1 to n).map(i =>
      f"q_synthetic_rather_long_name_$i%03d" -> (i * 1.2345 % 97.0))
    val failed = (1 to nFailed).map(i => f"q_synthetic_rather_long_name_broken_$i%03d")
    val total = mins.map(_._2).sum
    Bench.stdoutLine(mins, n, total, total * 0.8, total * 0.2, failed,
      "/root/testdata/sf0.1")
  }

  test("stdout line stays under the driver parse window at 250 entries") {
    val line = render(250, 0)
    assert(line.length < 1500, s"line length ${line.length}")
    assert(line.startsWith("{\"metric\":\"total\"") && line.endsWith("}"))
  }

  test("stdout line stays bounded with a long error list (cap at 10 + summary)") {
    val line = render(250, 40)
    assert(line.length < 1800, s"line length ${line.length}")
    // the errors array must be capped, not enumerated
    assert(line.contains("+30 more"))
  }

  test("stdout line keeps the slowest entries first") {
    val line = render(250, 0)
    // 96.xx-second entries must be present; sub-second ones sacrificed
    assert(line.contains(":96."))
  }
}
