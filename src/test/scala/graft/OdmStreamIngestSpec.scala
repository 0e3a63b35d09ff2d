package graft

import java.nio.file.{Files, Paths}

import graft.streaming.OdmStreamIngest
import org.apache.spark.sql.functions._

/** New files landing in the directory become command micro-batches; the
  * accumulated stream equals the batch pipeline over the same files. */
class OdmStreamIngestSpec extends SparkSuite {

  test("file-arrival streaming ingest == batch command stream") {
    val dir = Files.createTempDirectory("graft_odm_stream")
    val template = new String(Files.readAllBytes(
      Paths.get(graft.odm.OdmPipeline.fixturePath())), "UTF-8")
    def drop(i: Int): Unit =
      Files.writeString(dir.resolve(s"f$i.xml"),
        template.replace("FILE-1", s"FILE-$i").replace("\"S1\"", s""""S$i""""))

    drop(1); drop(2)
    val name = s"graft_odm_stream_${System.nanoTime()}"
    val q = OdmStreamIngest.commandStream(spark, dir.toString)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 40)
      drop(3) // a new file arrives mid-stream
      q.processAllAvailable()
      assert(spark.table(name).count() === 60)
      assert(spark.table(name).select("file_oid").distinct().count() === 3)
      // micro-batched output == the batch pipeline over the same glob
      val batch = graft.odm.OdmPipeline.commands(spark, s"$dir/*.xml")
        .select("level", "name", "params_json").collect().map(_.toString).sorted
      val streamed = spark.table(name)
        .select("level", "name", "params_json").collect().map(_.toString).sorted
      assert(streamed.toSeq === batch.toSeq)
    } finally q.stop()
  }
}
