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

  test("parseJsonDoubleMap pulls one named object out of a bench_full document") {
    // the regression-trigger reader: previous-round per-query times come
    // from bench_full_rNN.json's "queries" field — the parse must not
    // bleed into the neighboring same-shaped maps (gc_sec, fresh_probe)
    val full = """{"total":245.5,"context":{"xmx_mb":24576},""" +
      """"queries":{"a01_agg_hash":0.201,"l56_dedup_eval":5.946},""" +
      """"gc_sec":{"a01_agg_hash":9.9},"fresh_probe":{"l56_dedup_eval":4.43},""" +
      """"sf":"/root/testdata/sf0.1"}"""
    assert(Harness.parseJsonDoubleMap(full, "queries") ===
      Seq("a01_agg_hash" -> 0.201, "l56_dedup_eval" -> 5.946))
    assert(Harness.parseJsonDoubleMap(full, "fresh_probe") ===
      Seq("l56_dedup_eval" -> 4.43))
    assert(Harness.parseJsonDoubleMap(full, "missing") === Seq.empty)
    assert(Harness.parseJsonDoubleMap("", "queries") === Seq.empty)
  }

  test("jsonEscape escapes quotes, backslashes, and control characters") {
    assert(Harness.jsonEscape("a\"b\\c\nd\te\rf") ===
      "\"a\\\"b\\\\c\\nd\\te\\rf\"")
    // a raw control char (SOH) must become a u-escape, not pass through
    assert(Harness.jsonEscape("x" + 1.toChar + "y") === "\"x\\u0001y\"")
    assert(Harness.jsonEscape("plain") === "\"plain\"")
  }
}
