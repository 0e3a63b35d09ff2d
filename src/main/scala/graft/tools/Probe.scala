package graft.tools
import org.apache.spark.sql.SparkSession
// temporary dev probe — not part of the library surface
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROBE_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val qs = if (args.length > 1) args.drop(1).toSeq
      else Seq("l02c_dedup_simhash", "l02d_dedup_ngram_jaccard", "l02e_dedup_embed", "l03c_sim_ivf")
    for (q <- qs) {
      val t0 = System.nanoTime()
      try {
        val rows = graft.SparkEntry.queries(q)(spark, d).collect()
        val t1 = (System.nanoTime()-t0)/1e9
        val t0b = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, d).collect()
        val t2 = (System.nanoTime()-t0b)/1e9
        println(f"PROBE $q%-28s rows=${rows.length}%-6d cold=$t1%.1fs warm=$t2%.1fs")
        rows.take(5).foreach(r => println("PROBE    " + r))
      } catch { case e: Throwable => println(s"PROBE $q FAILED: ${e.getMessage.take(300)}") }
    }
    spark.stop()
  }
}
