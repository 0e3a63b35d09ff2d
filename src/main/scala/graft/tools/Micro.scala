package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway in-JVM A/B microbenchmark for optimization-round triage
  * (r15): compares shingle-spine variants under identical JVM/session
  * state, interleaved, min-of-N — immune to the box-level load drift
  * that makes back-to-back forked bench runs incomparable. Not part of
  * any query path. */
object Micro {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println("n_docs=" + docs.count() + " scanParts=" + docs.rdd.getNumPartitions)
    val words = docs.select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      .filter(size(col("w")) >= 3)
    val tr = "transform(sequence(1, size(w)-2), i -> concat_ws(' ', " +
      "element_at(w,i), element_at(w,i+1), element_at(w,i+2)))"
    def shOld = words.select(col("doc_id"), explode(expr(tr)).as("sh")).distinct()
    def shNew = words.select(col("doc_id"),
      explode(expr(s"array_distinct($tr)")).as("sh"))
    def shNewSpread = words.repartition(col("doc_id")).select(col("doc_id"),
      explode(expr(s"array_distinct($tr)")).as("sh"))
    def minsig(sh: org.apache.spark.sql.DataFrame) = sh.groupBy("doc_id").agg(
      min(expr(s"CAST(conv(substr(md5(concat('0|', sh)), 1, 15), 16, 10) AS BIGINT)")).as("mh0"),
      (1 until 8).map(h =>
        min(expr(s"CAST(conv(substr(md5(concat('$h|', sh)), 1, 15), 16, 10) AS BIGINT)")).as(s"mh$h")): _*)
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "sh_old" -> (() => shOld),
      "sh_new" -> (() => shNew),
      "sh_newspread" -> (() => shNewSpread),
      "sig_old" -> (() => minsig(shOld)),
      "sig_new" -> (() => minsig(shNew)),
      "sig_newspread" -> (() => minsig(shNewSpread)))
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    for (round <- 1 to 4; (name, f) <- variants) {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      if (round > 1) times(name) = dt :: times.getOrElse(name, Nil)
    }
    times.toSeq.sortBy(_._1).foreach { case (n, ts) =>
      println(f"$n%-14s min=${ts.min}%.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
