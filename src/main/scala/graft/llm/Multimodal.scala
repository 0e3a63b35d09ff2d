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
  * m01's decode is REAL: payloads are genuine self-describing containers
  * (binary PPM P6 images, RIFF/PCM WAV audio — both fully specified
  * public formats needing no codec libraries), built from document text
  * by `containerTable` and parsed back — header grammar, dimensions,
  * chunk walk, raster/sample extraction — by `decodePpm`/`decodeWav`.
  * The DuckDB oracle recomputes every feature straight from the SOURCE
  * text, so a decoder that misparses the container by even one byte
  * fails the hash gate. (Lossy formats like JPEG/FLAC stay out of scope:
  * those genuinely need codec libraries this container doesn't ship.)
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

  /** m04's feature extractor over raw (container-less) byte payloads:
    * 8 evenly-spaced byte samples normalized to [0,1); checksum =
    * xor-fold. Deterministic byte arithmetic, fully oracle-replayable. */
  def decodeStub(payload: Array[Byte]): (Long, Array[Float]) = {
    var checksum = 0L
    var i = 0
    while (i < payload.length) { checksum ^= (payload(i) & 0xffL) << ((i % 8) * 8); i += 1 }
    val n = payload.length
    val feats = Array.tabulate(8) { k =>
      if (n == 0) 0f else (payload((k * n) / 8) & 0xff) / 256f
    }
    (checksum, feats)
  }

  // ---- real container codecs (PPM P6 / RIFF WAV) -----------------------

  final case class PpmImage(width: Int, height: Int, maxVal: Int, raster: Array[Byte])
  final case class WavAudio(sampleRate: Int, bitsPerSample: Int, channels: Int,
      samples: Array[Byte])

  /** Binary PPM (P6): "P6\n<w> <h>\n<maxval>\n" + w·h RGB triplets. */
  def encodePpm(w: Int, h: Int, raster: Array[Byte]): Array[Byte] = {
    require(raster.length == 3 * w * h, s"raster ${raster.length} != 3*$w*$h")
    s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ raster
  }

  /** Canonical 44-byte RIFF/WAVE header (PCM, mono, 8-bit) + samples. */
  def encodeWav(sampleRate: Int, samples: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + samples.length); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate) // byte rate (1 ch × 8 bit)
    bb.putShort(1) // block align
    bb.putShort(8) // bits per sample
    bb.put("data".getBytes); bb.putInt(samples.length); bb.put(samples)
    bb.array()
  }

  /** Parse binary PPM: magic, whitespace/#-comment grammar, ASCII dims
    * and maxval, single whitespace, then exactly 3·w·h raster bytes.
    * None on any malformation — the decode stage dead-letters, never
    * throws mid-task. */
  def decodePpm(payload: Array[Byte]): Option[PpmImage] = {
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6') return None
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < payload.length) {
        val c = payload(i)
        if (c == '#') { while (i < payload.length && payload(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') i += 1
        else go = false
      }
    }
    // Long accumulation + a dimension bound: an adversarial header (e.g.
    // 20-digit dims) must not overflow 3·w·h into a small positive Int
    // that passes the length check and makes copyOfRange throw — the
    // contract is malformed → None, never an exception
    def asciiInt(): Long = {
      skipWs()
      var v = 0L; var any = false
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        if (v < Int.MaxValue) v = v * 10 + (payload(i) - '0')
        i += 1; any = true
      }
      if (any) v else -1L
    }
    val w = asciiInt(); val h = asciiInt(); val mv = asciiInt()
    i += 1 // the single whitespace byte after maxval
    val maxDim = 1 << 20 // far above any real PPM; keeps 3·w·h in Long range
    if (w <= 0 || h <= 0 || w > maxDim || h > maxDim || mv <= 0 || mv > 255) None
    else if (payload.length.toLong - i < 3L * w * h) None
    else Some(PpmImage(w.toInt, h.toInt, mv.toInt,
      java.util.Arrays.copyOfRange(payload, i, i + 3 * w.toInt * h.toInt)))
  }

  /** Parse RIFF/WAVE: container magic, then a little-endian chunk walk
    * (word-aligned) collecting fmt + data. None on malformation. */
  def decodeWav(payload: Array[Byte]): Option[WavAudio] = {
    if (payload.length < 12) return None
    def str4(o: Int) = new String(payload, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u32(o: Int): Long = (payload(o) & 0xffL) | (payload(o + 1) & 0xffL) << 8 |
      (payload(o + 2) & 0xffL) << 16 | (payload(o + 3) & 0xffL) << 24
    def u16(o: Int): Int = (payload(o) & 0xff) | (payload(o + 1) & 0xff) << 8
    if (str4(0) != "RIFF" || str4(8) != "WAVE") return None
    var o = 12
    var rate = -1; var bits = -1; var ch = -1
    var data: Array[Byte] = null
    while (o + 8 <= payload.length) {
      // chunk size stays in Long until bounds-checked: a ~2³¹ declared
      // size would wrap o+8+sz in Int arithmetic, dodge the range check,
      // and throw in copyOfRange — malformed must mean None, not a throw
      val id = str4(o); val szL = u32(o + 4)
      if (szL < 0 || o + 8L + szL > payload.length) return None
      val sz = szL.toInt
      if (id == "fmt ") {
        if (sz < 16) return None
        ch = u16(o + 10); rate = u32(o + 12).toInt; bits = u16(o + 22)
      } else if (id == "data") {
        data = java.util.Arrays.copyOfRange(payload, o + 8, o + 8 + sz)
      }
      o += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    if (rate <= 0 || bits <= 0 || ch <= 0 || data == null) None
    else Some(WavAudio(rate, bits, ch, data))
  }

  /** documents.text bytes stand in for undecoded media payloads
    * (m02/m04's raw-byte pipelines). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, "image/png").otherwise("audio/wav").as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** m04's byte-sample stage: batched, partition-local, shuffle-free. */
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

  /** m01's media fixtures: REAL containers built from document text —
    * even doc_ids become binary PPMs (raster = text bytes zero-padded /
    * truncated to 3·w·h), odd ones 8 kHz mono PCM WAVs (samples = text
    * bytes). Executor-side construction, one container per row. */
  def containerTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          if (id % 2 == 0) {
            val w = (8 + id % 8).toInt
            val h = math.max(1L, bytes.length / (3L * w)).toInt
            MediaRow(id, "image/ppm",
              encodePpm(w, h, java.util.Arrays.copyOf(bytes, 3 * w * h)))
          } else MediaRow(id, "audio/wav", encodeWav(8000, bytes))
        }
      }
  }

  final case class MediaDecoded(doc_id: Long, media_type: String, ok: Boolean,
      n_bytes: Long, n_content: Long, checksum: Long, mean_level: Double,
      width: Option[Long], height: Option[Long], sample_rate: Option[Long])

  /** The real decode stage: batched, partition-local, shuffle-free.
    * Sniffs the container by media_type, parses it, and derives features
    * from the DECODED content (raster pixels / PCM samples), never the
    * raw payload: checksum = Σ (i+1)·byteᵢ, mean_level = mean byte / 256
    * (both exact-integer gathers → one fixed-shape double division, the
    * l26 determinism pattern). Malformed containers surface as ok=false
    * dead-letter rows instead of failing the task. */
  def decodeMedia(media: Dataset[MediaRow]): Dataset[MediaDecoded] = {
    import media.sparkSession.implicits._
    def stats(content: Array[Byte]): (Long, Double) = {
      var cs = 0L; var sum = 0L; var i = 0
      while (i < content.length) {
        cs += (i + 1).toLong * (content(i) & 0xff)
        sum += (content(i) & 0xff)
        i += 1
      }
      val mean = if (content.length == 0) 0.0
        else sum.toDouble / (content.length.toDouble * 256.0)
      (cs, mean)
    }
    media.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        batch.map { r =>
          val reject = MediaDecoded(r.doc_id, r.media_type, ok = false,
            r.payload.length.toLong, 0L, 0L, 0.0, None, None, None)
          if (r.media_type.startsWith("image/")) decodePpm(r.payload) match {
            case Some(img) =>
              val (cs, mean) = stats(img.raster)
              MediaDecoded(r.doc_id, r.media_type, ok = true,
                r.payload.length.toLong, img.raster.length.toLong, cs, mean,
                Some(img.width.toLong), Some(img.height.toLong), None)
            case None => reject
          } else decodeWav(r.payload) match {
            case Some(wav) =>
              val (cs, mean) = stats(wav.samples)
              MediaDecoded(r.doc_id, r.media_type, ok = true,
                r.payload.length.toLong, wav.samples.length.toLong, cs, mean,
                None, None, Some(wav.sampleRate.toLong))
            case None => reject
          }
        }
      }
    }
  }

  def m01(spark: SparkSession, dir: String): DataFrame =
    decodeMedia(containerTable(spark, dir)).toDF()
      .select("doc_id", "media_type", "ok", "n_bytes", "n_content",
        "checksum", "mean_level", "width", "height", "sample_rate")
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

  // ---- perceptual hash dedup (image near-dup primitive) ---------------

  final case class ImageHash(doc_id: Long, width: Long, ahash: Long)

  /** 8-bit average hash over the DECODED raster: bit p = (gray of pixel
    * p) > (corpus-standard mean byte of the image), compared in exact
    * integer cross-multiplied form (sum3ₚ·n > 3·Σbytes) so the oracle's
    * character arithmetic lands on identical booleans — no float
    * thresholds. Every image has ≥ 8 pixels (w ≥ 8, h ≥ 1). Real
    * pHash/dHash swap in a DCT / gradient over the same decoded-raster
    * plumbing; the DATAFLOW (partition-local decode → tiny hash row per
    * image → hash-key aggregate) is the production shape. */
  def imageAHash(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (!r.media_type.startsWith("image/")) None
        else decodePpm(r.payload).map { img =>
          val raster = img.raster
          val n = raster.length.toLong
          var total = 0L
          var i = 0
          while (i < raster.length) { total += (raster(i) & 0xff); i += 1 }
          var bits = 0L
          var p = 0
          while (p < 8) {
            val s3 = (raster(3 * p) & 0xff).toLong +
              (raster(3 * p + 1) & 0xff) + (raster(3 * p + 2) & 0xff)
            if (s3 * n > 3L * total) bits |= (1L << p)
            p += 1
          }
          ImageHash(r.doc_id, img.width.toLong, bits)
        }
      }
    }
  }

  // ---- scene-cut detection (video stand-in) ---------------------------

  final case class SceneCut(doc_id: Long, frame_idx: Long, e_prev: Long, e_cur: Long)

  /** Energy jump (integer) that marks a scene boundary. */
  val CutThreshold = 256L

  /** m07: scene-change detection over m02's frame stream — a cut is a
    * frame whose integer energy (byte sum, partial tail frame included)
    * jumps by more than CutThreshold against its predecessor. This is
    * the keyframe-selection stage of a video curation pipeline (sample
    * ONE frame per detected scene instead of m02's uniform K): the
    * per-payload scan is partition-local and streaming (two frame
    * energies of state, never the decoded video), a real histogram-diff
    * detector swaps into the same per-frame fold. Emits one row per cut
    * with both energies — downstream keyframe sampling keys off
    * (doc_id, frame_idx). */
  def sceneCuts(media: Dataset[MediaRow]): Dataset[SceneCut] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val n = r.payload.length
        val nf = (n + FrameSize - 1) / FrameSize
        var prev = -1L
        (0 until nf).iterator.flatMap { k =>
          val end = math.min((k + 1) * FrameSize, n)
          var e = 0L
          var i = k * FrameSize
          while (i < end) { e += (r.payload(i) & 0xff); i += 1 }
          val cut =
            if (k > 0 && math.abs(e - prev) > CutThreshold)
              Some(SceneCut(r.doc_id, k.toLong, prev, e))
            else None
          prev = e
          cut
        }
      }
    }
  }

  def m07(spark: SparkSession, dir: String): DataFrame =
    sceneCuts(mediaTable(spark, dir)).toDF().orderBy("doc_id", "frame_idx")

  // ---- audio fingerprint (audio near-dup primitive) -------------------

  final case class AudioFp(doc_id: Long, b1: Long, b2: Long, dt: Long)

  /** Energy-window size (samples) for the audio fingerprint. */
  val FpWindow = 32

  /** Shazam-style landmark pairs over the DECODED PCM stream: the sample
    * stream is cut into fixed 32-sample windows, each window's energy is
    * its exact integer byte sum, a window is a LANDMARK when its energy
    * strictly exceeds both neighbors (interior strict local max — no
    * float thresholds), and each consecutive landmark pair emits the
    * fingerprint (energy₁ bucket, energy₂ bucket, Δwindows) — the
    * (f1, f2, Δt) constellation hash of the published scheme with the
    * spectral peak swapped for an energy peak (a real FFT needs no new
    * dataflow: same windows, same landmarks, same pairs). Buckets are
    * energy div 256 (energy ≤ 32·255, so 32 buckets). All integer
    * arithmetic → the oracle replays it from source characters. */
  def audioFingerprints(media: Dataset[MediaRow]): Dataset[AudioFp] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (!r.media_type.startsWith("audio/")) Iterator.empty
        else decodeWav(r.payload) match {
          case None => Iterator.empty
          case Some(wav) =>
            val s = wav.samples
            val nw = s.length / FpWindow
            val e = Array.tabulate(nw) { k =>
              var sum = 0L; var i = k * FpWindow
              while (i < (k + 1) * FpWindow) { sum += (s(i) & 0xff); i += 1 }
              sum
            }
            val peaks = (1 until math.max(nw - 1, 1))
              .filter(k => e(k) > e(k - 1) && e(k) > e(k + 1))
            peaks.sliding(2).collect { case Seq(k1, k2) =>
              AudioFp(r.doc_id, e(k1) / 256, e(k2) / 256, (k2 - k1).toLong)
            }
        }
      }
    }
  }

  /** m06: audio near-duplicate clusters — group identical landmark-pair
    * fingerprints across the corpus (the audio-space analogue of m05's
    * image hash: decode partition-local, only the 4-column fingerprint
    * row shuffles; matching tracks share many (b1,b2,dt) keys, so the
    * count-distinct-docs aggregate is the candidate generator a
    * verify-stage would re-score). */
  def m06(spark: SparkSession, dir: String): DataFrame =
    audioFingerprints(containerTable(spark, dir)).toDF()
      .groupBy("b1", "b2", "dt")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("doc_id")).as("n_docs"),
        min("doc_id").as("keep_id"))
      .orderBy("b1", "b2", "dt")

  // ---- video near-dup (frame-fingerprint join) ------------------------

  /** Boilerplate-frame cap: a frame fingerprint appearing in more than
    * this many videos is an intro card / black frame / silence — joining
    * through it would make the candidate pair set quadratic in the
    * bucket (the same flood-control contract as l02's BandBucketCap).
    * Capped hashes are dropped from PAIR GENERATION only; per-video
    * frame counts (the overlap denominator) keep them. */
  val FrameHashCap = 32

  /** m08: cross-VIDEO near-duplicate candidates — two videos are
    * candidates when ≥2 of their sampled frames share a fingerprint
    * (m02's uniform-K frame stream; the fingerprint join is how
    * production video dedup works — a perceptual frame hash like m05's
    * aHash swaps into the same key with no dataflow change, md5 here
    * keeps the oracle byte-exact). Catches exact re-uploads AND
    * trimmed/re-containered variants whose frame alignment survives.
    *
    * Scale shape: frames are map-side (one row in, ≤K fingerprint rows
    * out — never the decoded video); the ONLY corpus-sized shuffle is
    * the fingerprint-key join, and FrameHashCap bounds every bucket so
    * the pair fan-out is ≤ cap² per fingerprint at any corpus size; the
    * pair rollup and the two per-video count joins are
    * candidate-pair-sized. Overlap = |shared| / |union| on distinct
    * fingerprints, floor-rounded (the repo's cross-engine rule). */
  def videoNearDup(media: Dataset[MediaRow]): DataFrame = {
    // the fingerprint frame feeds FOUR consumers (cap rollup, two join
    // sides, per-video counts) — materialize it once so the payload
    // decode pass runs once, not four times (the l02 localCheckpoint
    // contract; frames are 3 narrow columns, ≤K rows per video)
    val frames = frameSample(media).toDF()
      .select(col("doc_id"), col("frame_md5")).distinct()
      .localCheckpoint()
    val ok = frames.groupBy("frame_md5")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") <= FrameHashCap)
      .select("frame_md5")
    val f = frames.join(ok, Seq("frame_md5"), "left_semi")
    val perDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
    f.as("a").join(f.as("b"),
        col("a.frame_md5") === col("b.frame_md5")
          && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared")) // frames are distinct per doc
      .filter(col("n_shared") >= 2)
      .join(perDoc.select(col("doc_id").as("doc_a"), col("n_frames").as("n_a")), "doc_a")
      .join(perDoc.select(col("doc_id").as("doc_b"), col("n_frames").as("n_b")), "doc_b")
      .withColumn("overlap",
        floor(col("n_shared").cast("double")
          / (col("n_a") + col("n_b") - col("n_shared"))
          * lit(1000000.0) + lit(0.5)) / lit(1000000.0))
      .select("doc_a", "doc_b", "n_shared", "n_a", "n_b", "overlap")
      .orderBy("doc_a", "doc_b")
  }

  def m08(spark: SparkSession, dir: String): DataFrame =
    videoNearDup(mediaTable(spark, dir))

  /** m05: perceptual-duplicate clusters — group identical average-hashes
    * within a width class (the image-space analogue of l01's content
    * hash; the hamming-radius>0 variant feeds these hash rows into l02's
    * banded join instead). Decode is partition-local; only the 3-column
    * hash row ever shuffles. */
  def m05(spark: SparkSession, dir: String): DataFrame =
    imageAHash(containerTable(spark, dir)).toDF()
      .groupBy("width", "ahash")
      .agg(count(lit(1)).as("n_images"), min("doc_id").as("keep_id"))
      .orderBy("width", "ahash")
}

object MultimodalQueries extends QueryModule {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_multimodal_decode" -> (Multimodal.m01 _),
    "m02_frame_sample" -> (Multimodal.m02 _),
    "m03_resize" -> (Multimodal.m03 _),
    "m04_media_features" -> (Multimodal.m04 _),
    "m05_image_phash" -> (Multimodal.m05 _),
    "m06_audio_fingerprint" -> (Multimodal.m06 _),
    "m07_scene_cuts" -> (Multimodal.m07 _),
    "m08_video_near_dup" -> (Multimodal.m08 _))

  // m01's oracle recomputes every decoded feature straight from the
  // SOURCE text, independently of the container bytes — the corpus is
  // pure ASCII, so ascii(substr(text, i, 1)) == the raster/sample byte
  // the JVM decoder extracted; a one-byte header-parse error shifts the
  // weighted checksum and fails the hash. m02-m04 replay byte/char
  // arithmetic the same way (md5(substr(text,..)) == JVM md5 of the
  // byte slice).
  val oracles: Map[String, String] = Map(
    // m05: the 8-bit aHash replayed from SOURCE characters — bit p uses
    // the exact cross-multiplied integer compare (sum3·n > 3·total) the
    // JVM path evaluates on decoded raster bytes; padding beyond the
    // text length is zero bytes on both sides
    "m05_image_phash" ->
      """WITH g AS (
        |  SELECT doc_id, text, 8 + doc_id % 8 AS w, length(text) AS len,
        |         3*(8 + doc_id % 8)*greatest(1, length(text) // (3*(8 + doc_id % 8))) AS n
        |  FROM documents WHERE doc_id % 2 = 0),
        |h AS (
        |  SELECT doc_id, w, n, least(len, n) AS m,
        |         coalesce(list_sum(list_transform(range(1, least(len, n) + 1),
        |             i -> ascii(substr(text, i, 1)))), 0) AS total,
        |         text
        |  FROM g),
        |a AS (
        |  SELECT doc_id, CAST(w AS BIGINT) AS width,
        |         CAST(coalesce(list_sum(list_transform(range(0, 8), p ->
        |           CASE WHEN
        |             ((CASE WHEN 3*p+1 <= m THEN ascii(substr(text, 3*p+1, 1)) ELSE 0 END)
        |             +(CASE WHEN 3*p+2 <= m THEN ascii(substr(text, 3*p+2, 1)) ELSE 0 END)
        |             +(CASE WHEN 3*p+3 <= m THEN ascii(substr(text, 3*p+3, 1)) ELSE 0 END)) * n
        |               > 3*total
        |           THEN 1 << p ELSE 0 END)), 0) AS BIGINT) AS ahash
        |  FROM h)
        |SELECT width, ahash, COUNT(*) AS n_images, MIN(doc_id) AS keep_id
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // m07: frame energies replayed from source characters (mediaTable's
    // payload is the text bytes); partial tail frame included via the
    // least() bound, exactly as the JVM fold clamps its end index
    "m07_scene_cuts" ->
      s"""WITH d AS (SELECT doc_id, text,
         |             CAST(ceil(length(text) / ${Multimodal.FrameSize}.0) AS BIGINT) AS nf
         |           FROM documents),
         |wins AS (
         |  SELECT doc_id, k,
         |         CAST(list_sum(list_transform(
         |           range(k * ${Multimodal.FrameSize} + 1,
         |                 least((k + 1) * ${Multimodal.FrameSize}, length(text)) + 1),
         |           i -> ascii(substr(text, CAST(i AS BIGINT), 1)))) AS BIGINT) AS e
         |  FROM d, LATERAL (SELECT unnest(range(0, nf)) AS k) t),
         |c AS (SELECT doc_id, k, e,
         |             lag(e) OVER (PARTITION BY doc_id ORDER BY k) AS ep
         |      FROM wins)
         |SELECT doc_id, CAST(k AS BIGINT) AS frame_idx, ep AS e_prev, e AS e_cur
         |FROM c WHERE ep IS NOT NULL AND abs(e - ep) > ${Multimodal.CutThreshold}
         |ORDER BY doc_id, frame_idx""".stripMargin,
    // m06: landmark pairs replayed from SOURCE characters — the WAV data
    // chunk is the text bytes verbatim, so window k's energy is the ascii
    // sum of chars [k·32+1, k·32+32]; strict-interior peaks via lag/lead
    // null checks; consecutive-peak pairing via lead over the peak rows.
    // list_sum yields HUGEINT in DuckDB → every surfaced integer is
    // CAST to BIGINT (the q12 lesson).
    "m06_audio_fingerprint" ->
      s"""WITH d AS (SELECT doc_id, text, length(text) // ${Multimodal.FpWindow} AS nw
         |           FROM documents WHERE doc_id % 2 <> 0),
         |wins AS (
         |  SELECT doc_id, k,
         |         list_sum(list_transform(
         |           range(k * ${Multimodal.FpWindow} + 1, k * ${Multimodal.FpWindow} + ${Multimodal.FpWindow + 1}),
         |           i -> ascii(substr(text, CAST(i AS BIGINT), 1)))) AS e
         |  FROM d, LATERAL (SELECT unnest(range(0, nw)) AS k) t),
         |peaks AS (
         |  SELECT doc_id, k, e FROM (
         |    SELECT doc_id, k, e,
         |           lag(e)  OVER (PARTITION BY doc_id ORDER BY k) AS ep,
         |           lead(e) OVER (PARTITION BY doc_id ORDER BY k) AS en
         |    FROM wins) w
         |  WHERE ep IS NOT NULL AND en IS NOT NULL AND e > ep AND e > en),
         |pairs AS (
         |  SELECT doc_id, e // 256 AS b1,
         |         lead(e) OVER pw // 256 AS b2,
         |         lead(k) OVER pw - k AS dt
         |  FROM peaks WINDOW pw AS (PARTITION BY doc_id ORDER BY k))
         |SELECT CAST(b1 AS BIGINT) AS b1, CAST(b2 AS BIGINT) AS b2,
         |       CAST(dt AS BIGINT) AS dt,
         |       COUNT(*) AS n_pairs, COUNT(DISTINCT doc_id) AS n_docs,
         |       MIN(doc_id) AS keep_id
         |FROM pairs WHERE b2 IS NOT NULL
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // m08: the frame-fingerprint join replayed over m02's frame SQL —
    // same distinct-per-doc fingerprints, same boilerplate cap on the
    // join key, same pre-cap denominators, same floor-rounded overlap
    "m08_video_near_dup" ->
      s"""WITH d AS (SELECT doc_id, text,
         |             (length(text) + ${Multimodal.FrameSize - 1}) // ${Multimodal.FrameSize} AS nf
         |           FROM documents),
         |f AS (SELECT DISTINCT doc_id, text,
         |             CAST(j * nf // ${Multimodal.FramesPerDoc} AS BIGINT) AS frame_idx
         |      FROM d, range(0, ${Multimodal.FramesPerDoc}) t(j)),
         |fr AS (SELECT DISTINCT doc_id,
         |          md5(substr(text, CAST(frame_idx * ${Multimodal.FrameSize} + 1 AS BIGINT), ${Multimodal.FrameSize})) AS frame_md5
         |       FROM f),
         |ok AS (SELECT frame_md5 FROM fr GROUP BY 1
         |       HAVING COUNT(*) <= ${Multimodal.FrameHashCap}),
         |g AS (SELECT fr.* FROM fr SEMI JOIN ok USING (frame_md5)),
         |pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nf FROM fr GROUP BY 1),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         CAST(COUNT(*) AS BIGINT) AS n_shared
         |  FROM g a JOIN g b ON a.frame_md5 = b.frame_md5 AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
         |SELECT doc_a, doc_b, n_shared, pa.nf AS n_a, pb.nf AS n_b,
         |       floor(CAST(n_shared AS DOUBLE) / (pa.nf + pb.nf - n_shared)
         |             * 1000000.0 + 0.5) / 1000000.0 AS overlap
         |FROM pairs
         |JOIN pd pa ON pa.doc_id = doc_a
         |JOIN pd pb ON pb.doc_id = doc_b
         |ORDER BY doc_a, doc_b""".stripMargin,
    "m01_multimodal_decode" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS len,
        |                  8 + doc_id % 8 AS w
        |           FROM documents),
        |img AS (
        |  SELECT doc_id, 'image/ppm' AS media_type, TRUE AS ok,
        |         CAST(3 + length(CAST(w AS VARCHAR)) + 1
        |              + length(CAST(greatest(1, len // (3*w)) AS VARCHAR)) + 5
        |              + 3*w*greatest(1, len // (3*w)) AS BIGINT) AS n_bytes,
        |         CAST(3*w*greatest(1, len // (3*w)) AS BIGINT) AS n_content,
        |         CAST(coalesce(list_sum(list_transform(
        |             range(1, least(len, 3*w*greatest(1, len // (3*w))) + 1),
        |             i -> i * ascii(substr(text, i, 1)))), 0) AS BIGINT) AS checksum,
        |         CAST(coalesce(list_sum(list_transform(
        |             range(1, least(len, 3*w*greatest(1, len // (3*w))) + 1),
        |             i -> ascii(substr(text, i, 1)))), 0) AS DOUBLE)
        |           / (CAST(3*w*greatest(1, len // (3*w)) AS DOUBLE) * 256.0) AS mean_level,
        |         CAST(w AS BIGINT) AS width,
        |         CAST(greatest(1, len // (3*w)) AS BIGINT) AS height,
        |         CAST(NULL AS BIGINT) AS sample_rate
        |  FROM d WHERE doc_id % 2 = 0),
        |wav AS (
        |  SELECT doc_id, 'audio/wav' AS media_type, TRUE AS ok,
        |         CAST(44 + len AS BIGINT) AS n_bytes,
        |         CAST(len AS BIGINT) AS n_content,
        |         CAST(coalesce(list_sum(list_transform(range(1, len + 1),
        |             i -> i * ascii(substr(text, i, 1)))), 0) AS BIGINT) AS checksum,
        |         CASE WHEN len = 0 THEN 0.0 ELSE
        |           CAST(coalesce(list_sum(list_transform(range(1, len + 1),
        |               i -> ascii(substr(text, i, 1)))), 0) AS DOUBLE)
        |             / (CAST(len AS DOUBLE) * 256.0) END AS mean_level,
        |         CAST(NULL AS BIGINT) AS width, CAST(NULL AS BIGINT) AS height,
        |         CAST(8000 AS BIGINT) AS sample_rate
        |  FROM d WHERE doc_id % 2 <> 0)
        |SELECT * FROM img UNION ALL SELECT * FROM wav ORDER BY doc_id""".stripMargin,
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
