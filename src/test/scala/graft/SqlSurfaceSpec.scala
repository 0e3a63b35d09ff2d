package graft

import org.apache.spark.sql.functions.col

/** The spark.sql entry path: a reference user writes SQL, not DataFrame
  * code. For queries whose oracle SQL is portable ANSI (no DuckDB
  * dialect), the SAME string must run on Spark's own SQL engine over
  * temp views and match the DataFrame-API result row-for-row — three
  * engines (Spark DF, Spark SQL, DuckDB) agreeing on one text. */
class SqlSurfaceSpec extends SparkSuite {

  // oracle strings that parse and run unmodified on Spark SQL — every
  // entry MUST run; an analysis error here fails the test (no slack, or
  // the parity claim silently erodes)
  private val portable = Seq(
    "a01_agg_hash", "a02_agg_distinct", "j01_join_broadcast",
    "j03_join_multiway", "u01_union", "o02_limit", "p02_filter_conj",
    "h02_incremental_agg", "u03_intersect", "t06_stream_join")

  test("portable oracle SQL runs on spark.sql and matches the DataFrame plan") {
    val dir = sf
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
    Tables.events(spark, dir).createOrReplaceTempView("events")
    portable.foreach { name =>
      val sql = SparkEntry.oracleSql(name)
        // the only dialect delta in these strings: DuckDB reads the raw
        // nanos column; our events view already exposes ts_ms
        .replace("epoch_ns(ts)//1000000", "ts_ms")
        .replace("//", " div ")
      val s = spark.sql(sql).collect().map(_.toString).toSeq
      val a = SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSeq
      assert(a === s, s"$name: spark.sql result diverges from DataFrame API")
    }
  }
}
