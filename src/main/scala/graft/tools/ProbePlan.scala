package graft.tools
import org.apache.spark.sql.SparkSession
// temporary dev probe — dumps physical plans for named queries (j17 via its
// conf-scoped helper, anything else through SparkEntry)
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // first arg is the data dir only if it looks like a path; otherwise
    // every arg is a query name (guards `ProbePlan j17` silently doing
    // nothing because "j17" was taken as the dir)
    val (d, names) = args.headOption match {
      case Some(p) if p.startsWith("/") => (p, args.drop(1).toSeq)
      case _ => ("/root/testdata/sf0.01", args.toSeq)
    }
    require(names.nonEmpty, "usage: ProbePlan [sfDir] <query|j17>...")
    names.foreach {
      case "j17" => println(graft.operators.Joins.j17Plan(spark, d))
      case q =>
        println(s"=== $q ===")
        println(graft.SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
