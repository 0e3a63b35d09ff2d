package graft.tools
import org.apache.spark.sql.SparkSession
// temporary dev probe — measures the shared-CC-labeling library path
// (Pipeline.dedupClusterLabels feeding BOTH l21From and l53From) against
// the two registered queries run independently. The claim under test:
// combined shared-path time ≈ l21 alone (the CC fixpoint, the dominant
// cost, is paid once).
object ProbeSharedCc {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def time[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROBE $what%-24s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    def drain(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc(); Thread.sleep(200); System.gc()
    }
    // warm codegen once at the smallest SF
    graft.llm.Pipeline.l21(spark, "/root/testdata/sf0.001").collect()
    graft.llm.Pipeline.l53(spark, "/root/testdata/sf0.001").collect()
    drain()
    time("l21 alone") { graft.llm.Pipeline.l21(spark, d).collect() }
    drain()
    time("l53 alone") { graft.llm.Pipeline.l53(spark, d).collect() }
    drain()
    time("shared l21+l53") {
      val labels = graft.Fixpoint.connectedComponentsStar(
        graft.llm.Llm.l02(spark, d).select("a", "b")).cache()
      graft.llm.Pipeline.l21From(labels).collect()
      graft.llm.Pipeline.l53From(spark, d, labels).collect()
      labels.unpersist(blocking = false)
    }
    spark.stop()
  }
}
