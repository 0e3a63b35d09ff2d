package graft

import graft.plans.LatestWinsRewrite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The latest-wins rewrite produces the same rows as the window form and
  * eliminates the Window/Sort from the plan. */
class LatestWinsRewriteSpec extends SparkSuite {

  private def latestWins = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_ms").desc, col("event_id").desc)
    Tables.events(spark, sf)
      .select("user_id", "event_id", "ts_ms", "event_type")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
  }

  test("rewrite fires: Window+Sort replaced by hash aggregate with max_by") {
    val before = latestWins.queryExecution.optimizedPlan.toString
    assert(before.contains("Window"), "sanity: un-extended session keeps the window")

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ LatestWinsRewrite
    try {
      val after = latestWins.queryExecution.optimizedPlan
      val s = after.toString
      // the Window node must be gone; Spark's own WindowGroupLimit
      // (map-side top-1 pre-filter) may remain below — it composes with
      // the aggregate and is kept deliberately
      val windows = after.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      assert(windows.isEmpty, s"window survived:\n$s")
      assert(s.contains("max_by"), s"expected max_by aggregate:\n$s")

      // results identical to the un-rewritten window form
      val rewritten = latestWins.select("user_id", "event_id", "ts_ms")
        .collect().map(_.toString).sorted.toSeq
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == LatestWinsRewrite)
      val original = latestWins.select("user_id", "event_id", "ts_ms")
        .collect().map(_.toString).sorted.toSeq
      assert(rewritten === original)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == LatestWinsRewrite)
    }
  }

  test("rule is conservative: DESC NULLS FIRST keeps the window") {
    // max_by's struct ordering treats null keys as smallest, so for
    // NULLS FIRST the window form picks a null-key row while max_by
    // would pick the non-null max — the rule must not fire.
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ LatestWinsRewrite
    try {
      val w = Window.partitionBy("user_id").orderBy(col("value").desc_nulls_first)
      val df = Tables.events(spark, sf)
        .select("user_id", "event_id", "value")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      assert(df.queryExecution.optimizedPlan.toString.contains("Window"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == LatestWinsRewrite)
    }
  }

  test("rule is conservative: ascending order keeps the window") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ LatestWinsRewrite
    try {
      val w = Window.partitionBy("user_id").orderBy(col("ts_ms").asc)
      val df = Tables.events(spark, sf)
        .select("user_id", "event_id", "ts_ms")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      assert(df.queryExecution.optimizedPlan.toString.contains("Window"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == LatestWinsRewrite)
    }
  }
}
