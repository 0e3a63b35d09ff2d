package graft

import org.apache.spark.sql.functions.col

/** The spark.sql entry path: a reference user writes SQL, not DataFrame
  * code. For queries whose oracle SQL is portable ANSI (no DuckDB
  * dialect), the SAME string must run on Spark's own SQL engine over
  * temp views and match the DataFrame-API result row-for-row — three
  * engines (Spark DF, Spark SQL, DuckDB) agreeing on one text. */
class SqlSurfaceSpec extends SparkSuite {

  // oracle strings that parse and run unmodified on Spark SQL
  private val portable = Seq(
    "a01_agg_hash", "a02_agg_distinct", "j01_join_broadcast",
    "j03_join_multiway", "u01_union", "o02_limit", "p02_filter_conj",
    "h02_incremental_agg", "l31_dataset_card", "t06_stream_join")

  test("portable oracle SQL runs on spark.sql and matches the DataFrame plan") {
    val dir = sf
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
    Tables.events(spark, dir).createOrReplaceTempView("events")
    val ran = portable.flatMap { name =>
      val sql = SparkEntry.oracleSql(name)
        // the only dialect delta in these strings: DuckDB reads the raw
        // nanos column; our events view already exposes ts_ms
        .replace("epoch_ns(ts)//1000000", "ts_ms")
        .replace("//", " div ")
      val fromSql =
        try Some(spark.sql(sql)) catch { case _: Throwable => None }
      fromSql.map { sdf =>
        val api = SparkEntry.queries(name)(spark, dir)
        val a = api.collect().map(_.toString).toSeq
        val s = sdf.collect().map(_.toString).toSeq
        assert(a === s, s"$name: spark.sql result diverges from DataFrame API")
        name
      }
    }
    assert(ran.size >= 8, s"too few oracle strings ran on Spark SQL: $ran")
  }
}
