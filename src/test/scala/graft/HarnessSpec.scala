package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract plumbing that runs OUTSIDE any Spark session: the
  * JSON escaper every harness line rides, and the fresh-probe output
  * parser — a silent parse bug there would make every future
  * bench_full.json carry an empty fresh_probe that reads as "probe ran,
  * found nothing slow", which is exactly the wrong default. */
class HarnessSpec extends AnyFunSuite {

  test("parseBenchQueries extracts the queries map from a Bench stdout capture") {
    val out =
      """26/08/15 WARN some spark noise {"not":"this"}
        |{"metric":"total","value":12.345,"unit":"sec","queries":{"l53_dedup_keep_best":6.625,"g01_pagerank_step":3.540},"n_queries":2,"n_failed":0,"failed":[],"sf":"/x"}
        |trailing noise""".stripMargin
    assert(Harness.parseBenchQueries(out) ===
      Seq("l53_dedup_keep_best" -> 6.625, "g01_pagerank_step" -> 3.54))
  }

  test("parseBenchQueries is total: garbage, empty, and metric-less input yield empty") {
    assert(Harness.parseBenchQueries("") === Seq.empty)
    assert(Harness.parseBenchQueries("no json here") === Seq.empty)
    // a metric line whose queries object is empty (all probed queries failed)
    assert(Harness.parseBenchQueries(
      """{"metric":"total","value":0.000,"unit":"sec","queries":{},"n_queries":0,"n_failed":1,"failed":["x"],"sf":"/x"}""")
      === Seq.empty)
    // queries key absent entirely
    assert(Harness.parseBenchQueries("""{"metric":"total","value":1.0}""") === Seq.empty)
  }

  test("jsonEscape escapes quotes, backslashes, and control characters") {
    assert(Harness.jsonEscape("a\"b\\c\nd\te\rf") ===
      "\"a\\\"b\\\\c\\nd\\te\\rf\"")
    // a raw control char (SOH) must become a u-escape, not pass through
    assert(Harness.jsonEscape("x" + 1.toChar + "y") === "\"x\\u0001y\"")
    assert(Harness.jsonEscape("plain") === "\"plain\"")
  }
}
