package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the shape of ScaleProbe's one-line scale100 JSON: slopes
  * computed from the right pairs, cold (staging) times riding next to
  * warm ones, and partial-scale queries dropped rather than shipped
  * with fabricated slopes.
  */
class ScaleProbeSpec extends AnyFunSuite {

  private val full = Map("q_a" -> 1.0, "q_b" -> 2.0)

  test("slopes pair the adjacent decades and cold rides alongside") {
    val line = ScaleProbe.renderJson("/tmp/sf",
      base = Map("q_a" -> 0.5), sf1 = Map("q_a" -> 1.0), sf10 = Map("q_a" -> 4.0),
      baseStg = Map("q_a" -> 2.0), sf1Stg = Map("q_a" -> 3.0), sf10Stg = Map("q_a" -> 9.0),
      names = Seq("q_a"))
    assert(!line.contains("\n"))
    assert(line.startsWith("""{"metric":"scale100","unit":"sec","sf":"/tmp/sf""""))
    // slope10 = sf1/base, slope100 = sf10/sf1 (not sf10/base)
    assert(line.contains(""""slope10":2.000"""))
    assert(line.contains(""""slope100":4.000"""))
    // cold slope100 from the two warm-JIT staging decades
    assert(line.contains(""""cold":{"base":2.000,"sf1":3.000,"sf10":9.000,"slope100":3.000}"""))
  }

  test("a query missing any of the six measurements is dropped, others survive") {
    val line = ScaleProbe.renderJson("/tmp/sf",
      base = full, sf1 = full, sf10 = Map("q_a" -> 1.0), // q_b failed at sf10
      baseStg = full, sf1Stg = full, sf10Stg = full, names = Seq("q_a", "q_b"))
    assert(line.contains("\"q_a\":"))
    assert(!line.contains("\"q_b\":"))
  }

  test("probe queries span the operator families and exist in SparkEntry") {
    ScaleProbe.probeQueries.foreach { q =>
      assert(SparkEntry.queries.contains(q), s"$q not in SparkEntry.queries")
    }
    assert(ScaleProbe.probeQueries.size >= 8)
  }
}
