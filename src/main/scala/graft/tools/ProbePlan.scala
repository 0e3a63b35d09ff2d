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
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    args.drop(1).foreach {
      case "j17" => println(graft.operators.Joins.j17Plan(spark, d))
      case q =>
        println(s"=== $q ===")
        println(graft.SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
