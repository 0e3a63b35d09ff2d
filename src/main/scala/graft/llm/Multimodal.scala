package graft.llm

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column pipeline: media as opaque binary columns + typed
  * metadata, with decode/feature-extract as a batched partition-local
  * stage — the Scala/Tungsten analogue of a Pandas-UDF-over-mapInPandas
  * stage in PySpark (same shape: iterator of batches in, iterator of
  * batches out; no per-row interpreter crossings).
  *
  * The actual image/audio decode is STUBBED (this container ships no
  * codec libraries): `decodeStub` produces deterministic fake features
  * from the bytes. Everything Spark-side — schema, binary column
  * handling, batch iteration, partition preservation — is real and
  * tested (MultimodalSpec).
  *
  * Scale posture: decode is embarrassingly parallel and stays
  * partition-local (mapPartitions, zero shuffle); batch size bounds peak
  * memory per task the way Arrow batch size does for Pandas UDFs.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long, checksum: Long,
      features: Array[Float])

  val BatchSize = 64

  /** Deterministic fake decoder: replace with a real codec at the `???`
    * boundary in production. Features = 8 evenly-spaced byte samples
    * normalized to [0,1); checksum = xor-fold. */
  def decodeStub(payload: Array[Byte]): (Long, Array[Float]) = {
    // real decode would be: val img = ??? ; imageToFeatures(img)
    var checksum = 0L
    var i = 0
    while (i < payload.length) { checksum ^= (payload(i) & 0xffL) << ((i % 8) * 8); i += 1 }
    val n = payload.length
    val feats = Array.tabulate(8) { k =>
      if (n == 0) 0f else (payload((k * n) / 8) & 0xff) / 256f
    }
    (checksum, feats)
  }

  /** documents.text bytes stand in for undecoded media payloads. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, "image/png").otherwise("audio/wav").as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** The decode stage: batched, partition-local, shuffle-free. */
  def decode(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        batch.map { r =>
          val (checksum, feats) = decodeStub(r.payload)
          MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong, checksum, feats)
        }
      }
    }
  }

  def m01(spark: SparkSession, dir: String): DataFrame =
    decode(mediaTable(spark, dir)).toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"), col("checksum"),
        round(element_at(col("features"), 1).cast("double"), 6).as("f0"))
      .orderBy("doc_id")
}

object MultimodalQueries extends QueryModule {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_multimodal_decode" -> (Multimodal.m01 _))
  // n_bytes is oracle-checkable (payload == utf8 text bytes); checksum/
  // features are decode-stub-specific and covered by MultimodalSpec.
  val oracles: Map[String, String] = Map.empty
}
