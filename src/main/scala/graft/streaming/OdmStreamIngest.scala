package graft.streaming

import graft.odm.OdmPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ODM ingest: the reference's AMQP-driven one-file-at-a-time
  * loop (R1/R5/R6) as a Structured Streaming file source — new ODM files
  * landing in a directory become command-stream micro-batches through
  * exactly the batch pipeline (OdmPipeline.explodedFrom is source-
  * agnostic; every stage is stateless, so the stream needs no watermark
  * and restarts exactly-once from the file-source checkpoint).
  *
  * At scale this replaces the reference's qos=1 single-consumer queue
  * with parallel file discovery: maxFilesPerTrigger bounds a micro-batch,
  * and each file's subtree is independent work.
  */
object OdmStreamIngest {

  /** Commands from every *.xml that lands under `dir` (streaming DF). */
  def commandStream(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.readStream
      .format("binaryFile")
      .option("pathGlobFilter", "*.xml")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY"))
      .load(dir)
    val parsed = raw.select(
      from_xml(col("content").cast("string"), OdmPipeline.odmSchema).as("odm"))
      .select(col("odm.*"))
    OdmPipeline.commandsOf(OdmPipeline.explodedFrom(parsed))
  }
}
