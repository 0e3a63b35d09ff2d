package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from one QueryModule per SURVEY.md
  * §2.2 family; module key sets are disjoint (checked at class-init so a
  * collision fails fast in every sbt test run).
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    operators.Flagship,
    operators.Scans,
    operators.Joins,
    operators.Aggregates,
    operators.Windows,
    operators.Scalars,
    operators.EventTime,
    operators.Extras,
    operators.Pivots,
    operators.History,
    operators.Graph,
    operators.Lakehouse,
    llm.Llm,
    llm.Dedup,
    llm.Pipeline,
    llm.MultimodalQueries,
    llm.MinHashLshMl,
    llm.Semantic,
    llm.Spans,
    llm.Quantize,
    llm.Features,
    streaming.StreamCommit,
    odm.OdmQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Flagship.q00(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = modules.flatMap(_.queries.toSeq)
    require(all.size == all.map(_._1).distinct.size,
      s"duplicate query ids across modules: ${all.map(_._1).diff(all.map(_._1).distinct)}")
    all.toMap
  }

  /** Sink-class ids (queries whose measured run writes real files),
    * aggregated from each module's own declaration — Bench's read-vs-sink
    * split reads this, so a module adding a file-writing query classifies
    * it at the definition site, not in a central list. Membership must
    * name keys the declaring module actually registers. */
  val sinkQueries: Set[String] = {
    modules.foreach { m =>
      val stray = m.sinkQueries.diff(m.queries.keySet)
      require(stray.isEmpty,
        s"${m.getClass.getSimpleName} declares sink ids it does not register: $stray")
    }
    modules.flatMap(_.sinkQueries).toSet
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver's weaker rows-only check
    * (those are covered by unit/property/golden tests instead). */
  val oracleSql: Map[String, String] = {
    val all = modules.flatMap(_.oracles.toSeq)
    val orphans = all.map(_._1).filterNot(queries.contains)
    require(orphans.isEmpty, s"oracleSql keys without queries: $orphans")
    all.toMap
  }
}
