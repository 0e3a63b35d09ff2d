package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Per-query formatted-plan dump for the optimization rounds: writes
  * `<outDir>/<query>_<suffix>.txt` with `.explain("formatted")` output for
  * each requested query, so before/after plan evidence is reviewable
  * without running Spark. Run:
  *   sbt "runMain graft.PlanDump /root/testdata/sf0.1 plans/r15 before g01_pagerank_step,l02_dedup_near"
  * Uses the same session shape as Bench (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus, UTC) so the dumped plan is the one the
  * bench actually times.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <id,id,...>")
    val Array(sfDir, outDir, suffix, idCsv) = args.take(4)
    val ids = idCsv.split(",").map(_.trim).filter(_.nonEmpty)
    // library-frame plans the registered queries hide behind
    // localCheckpoint/memo materialization — dumped for plan evidence
    val extra: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      Map("l02_pair_spine" -> ((s, d) =>
        llm.Llm.pairSpineForPlan(Tables.documents(s, d))),
        "cooc_pair_spine" -> ((s, d) =>
          operators.Graph.coocSpineForPlan(s, d)))
    val unknown = ids.filterNot(i =>
      SparkEntry.queries.contains(i) || extra.contains(i))
    require(unknown.isEmpty, s"unknown query ids: ${unknown.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    ids.foreach { name =>
      val df = SparkEntry.queries.getOrElse(name, extra(name))(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).trim
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt + "\n")
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
