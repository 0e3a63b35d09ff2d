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

  // ---- frame sampling (video stand-in) --------------------------------

  final case class Frame(doc_id: Long, frame_idx: Long, frame_len: Long, frame_md5: String)

  val FrameSize = 64
  val FramesPerDoc = 4

  private def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Frame sampling: treat the payload as a "video" of fixed-size frames
    * and keep up to K uniformly-spaced frames per row. Partition-local
    * flatMap (one row in, ≤K rows out) — no shuffle, no full-payload
    * materialization beyond the sampled slices, which is the property
    * that matters when the payload is a multi-MB video at 100 TB scale.
    * The "codec" is a byte-slice stub; a real one replaces frameBytes. */
  def frameSample(media: Dataset[MediaRow]): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val n = r.payload.length
        val nFrames = (n + FrameSize - 1) / FrameSize
        (0 until FramesPerDoc).map(j => j.toLong * nFrames / FramesPerDoc)
          .distinct.map { fi =>
            val start = (fi * FrameSize).toInt
            val len = math.max(0, math.min(FrameSize, n - start))
            val slice = java.util.Arrays.copyOfRange(r.payload, start, start + len)
            Frame(r.doc_id, fi, len.toLong, md5Hex(slice))
          }
      }
    }
  }

  def m02(spark: SparkSession, dir: String): DataFrame =
    frameSample(mediaTable(spark, dir)).toDF().orderBy("doc_id", "frame_idx")

  // ---- resize (image stand-in) ----------------------------------------

  final case class ImageRow(doc_id: Long, width: Int, height: Int, payload: Array[Byte])
  final case class ResizedImage(
      doc_id: Long, out_w: Long, out_h: Long, out_len: Long, out_md5: String)

  /** Typed image table: payload bytes as a row-major w×h raster, with the
    * dimensions carried as typed metadata (derived deterministically from
    * doc_id so the oracle can replay them). */
  def imageTable(spark: SparkSession, dir: String): Dataset[ImageRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        (lit(8) + col("doc_id") % 8).cast("int").as("width"),
        (length(col("text")) / (lit(8) + col("doc_id") % 8)).cast("int").as("height"),
        col("text").cast("binary").as("payload"))
      .as[ImageRow]
  }

  /** Resize stage: 2× decimation in both dimensions (keep pixels with even
    * x and even y) — the plumbing of a real resampler (typed dims in, new
    * dims + new raster out) with the kernel stubbed to nearest-neighbor
    * downsample. Partition-local map, zero shuffle. */
  def resize(images: Dataset[ImageRow]): Dataset[ResizedImage] = {
    import images.sparkSession.implicits._
    images.mapPartitions { rows =>
      rows.map { r =>
        val w = r.width; val h = r.height
        val out = Array.newBuilder[Byte]
        var y = 0
        while (y < h) {
          if (y % 2 == 0) {
            var x = 0
            while (x < w) {
              if (x % 2 == 0) out += r.payload(y * w + x)
              x += 1
            }
          }
          y += 1
        }
        ResizedImage(r.doc_id, (w + 1) / 2, (h + 1) / 2,
          ((w + 1) / 2).toLong * ((h + 1) / 2), md5Hex(out.result()))
      }
    }
  }

  def m03(spark: SparkSession, dir: String): DataFrame =
    resize(imageTable(spark, dir)).toDF().orderBy("doc_id")

  // ---- feature extraction ---------------------------------------------

  /** Feature-extract stage surfaced as flat columns: every stub feature is
    * pure byte arithmetic (byte k·n/8, scaled 1/256 — exact dyadic
    * doubles), so unlike m01's xor checksum this projection is fully
    * DuckDB-oracled. */
  def m04(spark: SparkSession, dir: String): DataFrame = {
    val feats = decode(mediaTable(spark, dir)).toDF()
    val fcols = (0 until 8).map(k =>
      element_at(col("features"), k + 1).cast("double").as(s"f$k"))
    feats.select(col("doc_id") +: col("media_type") +: col("n_bytes") +: fcols: _*)
      .orderBy("doc_id")
  }
}

object MultimodalQueries extends QueryModule {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_multimodal_decode" -> (Multimodal.m01 _),
    "m02_frame_sample" -> (Multimodal.m02 _),
    "m03_resize" -> (Multimodal.m03 _),
    "m04_media_features" -> (Multimodal.m04 _))

  // m01's xor-fold checksum has no DuckDB image (covered by
  // MultimodalSpec fixed vectors); m02-m04 are stubbed on byte/char
  // arithmetic the oracle replays exactly — the corpus is pure ASCII, so
  // DuckDB char positions == Spark byte positions and md5(substr(text,..))
  // equals the JVM md5 of the byte slice.
  val oracles: Map[String, String] = Map(
    "m02_frame_sample" ->
      s"""WITH d AS (SELECT doc_id, text,
         |             (length(text) + ${Multimodal.FrameSize - 1}) // ${Multimodal.FrameSize} AS nf
         |           FROM documents),
         |f AS (SELECT DISTINCT doc_id, text,
         |             CAST(j * nf // ${Multimodal.FramesPerDoc} AS BIGINT) AS frame_idx
         |      FROM d, range(0, ${Multimodal.FramesPerDoc}) t(j))
         |SELECT doc_id, frame_idx,
         |       CAST(length(substr(text, CAST(frame_idx * ${Multimodal.FrameSize} + 1 AS BIGINT), ${Multimodal.FrameSize})) AS BIGINT) AS frame_len,
         |       md5(substr(text, CAST(frame_idx * ${Multimodal.FrameSize} + 1 AS BIGINT), ${Multimodal.FrameSize})) AS frame_md5
         |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "m03_resize" ->
      """WITH d AS (SELECT doc_id, text, 8 + doc_id % 8 AS w FROM documents),
        |r AS (SELECT doc_id, w, length(text) // w AS h, text FROM d)
        |SELECT doc_id,
        |       CAST((w + 1) // 2 AS BIGINT) AS out_w,
        |       CAST((h + 1) // 2 AS BIGINT) AS out_h,
        |       CAST(((w + 1) // 2) * ((h + 1) // 2) AS BIGINT) AS out_len,
        |       md5(array_to_string(list_filter(split(text, ''),
        |         (c, i) -> (i - 1) < w * h
        |               AND ((i - 1) % w) % 2 = 0
        |               AND ((i - 1) // w) % 2 = 0), '')) AS out_md5
        |FROM r ORDER BY doc_id""".stripMargin,
    "m04_media_features" -> {
      val fcols = (0 until 8).map(k =>
        s"ascii(substr(text, CAST($k * length(text) // 8 AS BIGINT) + 1, 1)) / 256.0 AS f$k")
        .mkString(",\n        |       ")
      s"""SELECT doc_id,
         |       CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
         |       CAST(strlen(text) AS BIGINT) AS n_bytes,
         |       $fcols
         |FROM documents ORDER BY doc_id""".stripMargin
    })
}
