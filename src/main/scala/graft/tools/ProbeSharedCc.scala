package graft.tools
import org.apache.spark.sql.SparkSession
// temporary dev probe — measures the shared-CC-labeling library path
// (Pipeline.dedupClusterLabels feeding BOTH l21From and l53From) against
// the two registered queries run with the session memos CLEARED between
// them (the pre-memo cost a user without the library's sharing would
// pay). The claim under test: combined shared-path time ≈ l21 alone
// (pair graph + CC fixpoint, the dominant costs, are paid once).
// Drains go through Harness.drain so memo-protected frames survive;
// independence between the "alone" timings is forced by clearCcMemo
// (which also clears the pair-graph memo) — a bare unpersist-all here
// would leave the memos serving dead checkpoint blocks.
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
    def reset(): Unit = {
      graft.llm.Pipeline.clearCcMemo() // clears the pair memo too
      graft.Harness.drain(spark, settleMs = 200L)
    }
    // warm codegen once at the smallest SF
    graft.llm.Pipeline.l21(spark, "/root/testdata/sf0.001").collect()
    graft.llm.Pipeline.l53(spark, "/root/testdata/sf0.001").collect()
    reset()
    time("l21 alone (cold)") { graft.llm.Pipeline.l21(spark, d).collect() }
    reset()
    time("l53 alone (cold)") { graft.llm.Pipeline.l53(spark, d).collect() }
    reset()
    time("shared l21+l53") {
      val labels = graft.llm.Pipeline.dedupClusterLabels(spark, d)
      graft.llm.Pipeline.l21From(labels).collect()
      graft.llm.Pipeline.l53From(spark, d, labels).collect()
    }
    graft.llm.Pipeline.clearCcMemo()
    spark.stop()
  }
}
