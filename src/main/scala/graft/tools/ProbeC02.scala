package graft.tools
import org.apache.spark.sql.SparkSession
import graft.odm._
object ProbeC02 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"C02PROBE $name%-22s ${(System.nanoTime()-t0)/1e9}%.2fs"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    (1 to 2).foreach { round =>
      println(s"C02PROBE -- round $round")
      val env = t("enveloped build")(OdmPipeline.enveloped(spark, OdmPipeline.fixturePath(), OdmQueries.BatchCmdId, "importer-1"))
      val rows = t("enveloped collect")(env.collect().toSeq)
      val events = t("events toDF")(rows
        .filter(r => !r.getAs[String]("params_json").contains("SK01"))
        .map { r =>
          val entity = r.getAs[String]("name").stripPrefix("odm-import/")
            .stripPrefix("insert-").stripPrefix("upsert-").stripPrefix("remove-")
          (r.getAs[String]("id"), s"$entity/created")
        }.toDF("cid", "name"))
      val gated = t("gatedCommands build")(OdmPipeline.gatedCommands(spark,
        OdmPipeline.fixturePath(), OdmQueries.BatchCmdId, "importer-1", events))
      t("gated collect")(gated.collect())
    }
    spark.stop()
  }
}
