package graft

import org.apache.spark.sql.functions._

/** t07 funnel chain and l26 k-means update step. */
class AnalyticsSpec extends SparkSuite {

  test("t07: stage times form a strictly increasing chain per user") {
    val rows = operators.EventTime.t07(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tView = r.getLong(1)
      val tClick = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val tPurchase = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val reached = r.getInt(4)
      tClick.foreach(t => assert(t > tView))
      tPurchase.foreach { t =>
        assert(tClick.isDefined, "purchase stage requires click stage")
        assert(t > tClick.get)
      }
      assert(reached === 1 + tClick.size + tPurchase.size)
    }
  }

  test("t07: matches a brute-force local funnel replay") {
    val events = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts_ms")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = events.groupBy(_._1).flatMap { case (uid, es) =>
      val v = es.filter(_._2 == "view").map(_._3)
      if (v.isEmpty) None
      else {
        val t1 = v.min
        val t2 = es.filter(e => e._2 == "click" && e._3 > t1).map(_._3)
          .reduceOption(_ min _)
        val t3 = t2.flatMap(t =>
          es.filter(e => e._2 == "purchase" && e._3 > t).map(_._3)
            .reduceOption(_ min _))
        Some(uid -> ((t1, t2, t3)))
      }
    }
    val got = operators.EventTime.t07(spark, sf).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    }.toMap
    assert(got === expected.toMap)
  }

  test("t14: dynamic-gap sessions match a driver-side interval-merge replay") {
    val events = Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "value", "ts_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))
    def gapOf(t: String): Long = if (t == "click") 600000L else 1800000L
    val expected = events.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._5, e._2))
      val sessions = scala.collection.mutable.ArrayBuffer[
        scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]]()
      var maxEnd = Long.MinValue
      sorted.foreach { case (_, _, t, v, ts) =>
        if (sessions.isEmpty || ts >= maxEnd)
          sessions += scala.collection.mutable.ArrayBuffer()
        sessions.last += ((ts, ts + gapOf(t), v))
        maxEnd = math.max(maxEnd, ts + gapOf(t))
      }
      sessions.map { s =>
        val sum = s.map(x => BigDecimal(x._3).setScale(4, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble
        (u, s.map(_._1).min, s.map(_._2).max, s.size.toLong, sum)
      }
    }.sortBy(x => (x._1, x._2))
    val got = operators.EventTime.t14(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === expected.toSeq)
    // the dynamic gap must actually bite: clicks close sessions sooner
    // than a uniform 30-minute gap would
    val fixedSessions = operators.EventTime.t03(spark, sf).count()
    assert(got.length > fixedSessions,
      "10-minute click gap must split more sessions than the fixed 30-minute gap")
  }

  test("l26: every vector is assigned and counts are dim-consistent") {
    val out = llm.Dedup.l26(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val total = Tables.embeddings(spark, sf).count()
    // 64 rows per occupied cluster; per-cluster n identical across dims
    val byCid = out.groupBy(_._1)
    byCid.foreach { case (cid, rows) =>
      assert(rows.length === 64, s"cluster $cid should have 64 dim rows")
      assert(rows.map(_._3).distinct.length === 1, s"cluster $cid: inconsistent n")
    }
    // assignment is a partition: cluster sizes sum to the corpus
    assert(byCid.map(_._2.head._3).sum === total)
    // centroid means live inside the data's value range
    out.foreach { case (_, _, _, m) => assert(m > -10.0 && m < 10.0) }
  }
}
