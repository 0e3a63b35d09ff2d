package graft

import graft.functions.Welford
import graft.llm.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  test("m01: every real container parses; decode is deterministic and shuffle-free") {
    val out1 = Multimodal.m01(spark, sf).collect()
    val out2 = Multimodal.m01(spark, sf).collect()
    assert(out1.toSeq === out2.toSeq)
    assert(out1.length === 500)
    // every synthesized PPM/WAV must survive its own header parser
    assert(out1.forall(_.getBoolean(1 + 1)), "all containers must decode (ok=true)")
    // wav rows carry the parsed sample rate; ppm rows the parsed dims
    val byType = out1.groupBy(_.getString(1))
    assert(byType("audio/wav").forall(r => r.getLong(r.fieldIndex("sample_rate")) === 8000L))
    assert(byType("image/ppm").forall { r =>
      val w = r.getLong(r.fieldIndex("width"))
      w >= 8L && w <= 15L && r.getLong(r.fieldIndex("height")) >= 1L
    })
    // decode is a narrow map: no Exchange in the plan before the sort
    val plan = Multimodal.decodeMedia(Multimodal.containerTable(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode stage shuffled:\n$plan")
  }

  test("ppm codec: golden vector, comment/whitespace grammar, malformed rejection") {
    val raster = Array[Byte](10, 20, 30, 40, 50, 60)
    val ppm = Multimodal.encodePpm(2, 1, raster)
    assert(new String(ppm.take(11), "US-ASCII") === "P6\n2 1\n255\n")
    val img = Multimodal.decodePpm(ppm).get
    assert((img.width, img.height, img.maxVal) === (2, 1, 255))
    assert(img.raster.toSeq === raster.toSeq)
    // the header grammar allows comments and mixed whitespace
    val weird = "P6\n# a comment\n 2\t1 #x\n255\n".getBytes("US-ASCII") ++ raster
    val img2 = Multimodal.decodePpm(weird).get
    assert((img2.width, img2.height) === (2, 1) && img2.raster.toSeq === raster.toSeq)
    // malformed: wrong magic, truncated raster, absurd dims
    assert(Multimodal.decodePpm("P5\n2 1\n255\nxxxxxx".getBytes).isEmpty)
    assert(Multimodal.decodePpm(ppm.dropRight(1)).isEmpty)
    assert(Multimodal.decodePpm("P6\n0 1\n255\n".getBytes).isEmpty)
    // adversarial overflow headers: 20-digit dims and an Int-wrapping
    // 3·w·h product must dead-letter (None), never throw (round-5 advice)
    assert(Multimodal.decodePpm("P6\n99999999999999999999 1\n255\n".getBytes).isEmpty)
    assert(Multimodal.decodePpm("P6\n46341 46341\n255\nxx".getBytes).isEmpty)
    assert(Multimodal.decodePpm("P6\n715827883 2\n255\nxxxxxx".getBytes).isEmpty)
  }

  test("wav codec: golden vector, chunk walk, malformed rejection") {
    val samples = "abc".getBytes("US-ASCII")
    val wav = Multimodal.encodeWav(8000, samples)
    assert(wav.length === 47)
    val parsed = Multimodal.decodeWav(wav).get
    assert((parsed.sampleRate, parsed.bitsPerSample, parsed.channels) === (8000, 8, 1))
    assert(parsed.samples.toSeq === samples.toSeq)
    // an extra unknown chunk before data must be skipped, not fatal
    val withJunk = {
      val bb = java.nio.ByteBuffer.allocate(12 + 8 + 4 + (wav.length - 12))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(wav, 0, 12) // RIFF....WAVE
      bb.put("LIST".getBytes); bb.putInt(4); bb.put("info".getBytes)
      bb.put(wav, 12, wav.length - 12)
      bb.array()
    }
    assert(Multimodal.decodeWav(withJunk).get.samples.toSeq === samples.toSeq)
    assert(Multimodal.decodeWav("RIFFxxxxJUNK".getBytes).isEmpty)
    assert(Multimodal.decodeWav(wav.take(20)).isEmpty)
    // adversarial chunk size ~2³¹: o+8+sz wraps in Int arithmetic — must
    // bounds-check in Long and dead-letter, never throw (round-5 advice)
    val evil = wav.clone()
    evil(40) = 0xf7.toByte; evil(41) = 0xff.toByte // "data" size field
    evil(42) = 0xff.toByte; evil(43) = 0x7f.toByte // = Int.MaxValue - 8
    assert(Multimodal.decodeWav(evil).isEmpty)
  }

  test("decodeMedia features derive from decoded content (fixed vector)") {
    import spark.implicits._
    val raster = Array[Byte](10, 20, 30, 40, 50, 60)
    val media = Seq(Multimodal.MediaRow(2L, "image/ppm",
      Multimodal.encodePpm(2, 1, raster))).toDS()
    val r = Multimodal.decodeMedia(media).collect().head
    assert(r.ok)
    assert(r.checksum === (1 * 10 + 2 * 20 + 3 * 30 + 4 * 40 + 5 * 50 + 6 * 60).toLong)
    assert(r.mean_level === 210.0 / (6.0 * 256.0))
    assert((r.width, r.height) === (Some(2L), Some(1L)))
    // malformed payload dead-letters as ok=false instead of throwing
    val bad = Seq(Multimodal.MediaRow(3L, "image/ppm", "nope".getBytes)).toDS()
    assert(Multimodal.decodeMedia(bad).collect().head.ok === false)
  }

  test("decodeStub: fixed vectors") {
    val (cs, feats) = Multimodal.decodeStub("abcdefgh".getBytes("UTF-8"))
    assert(feats.length === 8)
    assert(feats.forall(f => f >= 0f && f < 1f))
    assert(cs === ('a'.toLong | 'b'.toLong << 8 | 'c'.toLong << 16 | 'd'.toLong << 24
      | 'e'.toLong << 32 | 'f'.toLong << 40 | 'g'.toLong << 48 | 'h'.toLong << 56))
  }

  test("m05: aHash is identical for identical rasters, in range, and locally recomputable") {
    import spark.implicits._
    val px = Array.tabulate(3 * 8 * 2)(i => ((i * 37 + 11) % 251).toByte)
    val rows = Seq(
      Multimodal.MediaRow(0L, "image/ppm", Multimodal.encodePpm(8, 2, px)),
      Multimodal.MediaRow(2L, "image/ppm", Multimodal.encodePpm(8, 2, px.clone())),
      Multimodal.MediaRow(4L, "image/ppm", Multimodal.encodePpm(8, 2,
        px.clone().updated(0, (px(0) ^ 0x7f).toByte))),
      Multimodal.MediaRow(1L, "audio/wav", Multimodal.encodeWav(8000, px)))
    val out = Multimodal.imageAHash(rows.toDS()).collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq === Seq(0L, 2L, 4L), "wav row must not hash")
    assert(out(0).ahash === out(1).ahash, "identical rasters must collide")
    assert(out.forall(h => h.ahash >= 0 && h.ahash <= 255), "8-bit hash range")
    // local recompute of the integer cross-multiplied bits
    val n = px.length.toLong
    val total = px.map(_ & 0xff).map(_.toLong).sum
    val expected = (0 until 8).map { p =>
      val s3 = (px(3 * p) & 0xff).toLong + (px(3 * p + 1) & 0xff) + (px(3 * p + 2) & 0xff)
      if (s3 * n > 3L * total) 1L << p else 0L
    }.sum
    assert(out(0).ahash === expected, "hash diverged from the definition")
  }

  test("m02: frame sampling is shuffle-free and matches fixed vectors") {
    import spark.implicits._
    val plan = Multimodal.frameSample(Multimodal.mediaTable(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frameSample shuffled:\n$plan")

    // 100-byte payload: nFrames=2, sampled idxs {0,0,1,1}.distinct={0,1}
    val media = Seq(Multimodal.MediaRow(7L, "video/mp4", Array.fill(100)('a'.toByte))).toDS()
    val frames = Multimodal.frameSample(media).collect().sortBy(_.frame_idx)
    assert(frames.map(f => (f.frame_idx, f.frame_len)).toSeq === Seq((0L, 64L), (1L, 36L)))
    val md = java.security.MessageDigest.getInstance("MD5")
    val exp0 = md.digest(Array.fill(64)('a'.toByte)).map(b => f"${b & 0xff}%02x").mkString
    assert(frames(0).frame_md5 === exp0)
  }

  test("m08: video near-dup pairs — exact dups hit overlap 1, the " +
      "boilerplate cap suppresses flood buckets, synthetic vectors match") {
    import spark.implicits._
    // three "videos": a == b (exact dup), c shares frame 0 only with a/b
    val fa = Array.tabulate(200)(i => (i % 97).toByte)
    val fc = fa.take(64) ++ Array.tabulate(136)(i => (i % 89 + 100).toByte)
    val media = Seq(
      Multimodal.MediaRow(1L, "video/mp4", fa),
      Multimodal.MediaRow(2L, "video/mp4", fa.clone()),
      Multimodal.MediaRow(3L, "video/mp4", fc)).toDS()
    val got = Multimodal.videoNearDup(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    // only the exact-dup pair survives the ≥2-shared-frames gate
    // (c shares just its aligned first frame with a/b)
    assert(got.toSeq === Seq((1L, 2L, 4L, 1.0)))

    // flood control: FrameHashCap+1 identical videos would generate
    // ~cap²/2 pairs per frame hash; every frame hash is over the cap, so
    // pair generation must yield NOTHING (the l02 BandBucketCap contract)
    val flood = (0 until Multimodal.FrameHashCap + 1)
      .map(i => Multimodal.MediaRow(100L + i, "video/mp4", fa.clone()))
    val floodOut = Multimodal.videoNearDup(flood.toDS()).collect()
    assert(floodOut.isEmpty, s"capped bucket leaked ${floodOut.length} pairs")

    // corpus sanity: pairs exist, are ordered, and overlap ∈ (0, 1]
    val corpus = Multimodal.m08(spark, sf).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val ov = r.getDouble(5)
      assert(ov > 0.0 && ov <= 1.0 && r.getLong(2) >= 2L)
    }
  }

  test("m03: resize decimates even rows/cols and carries typed dims") {
    import spark.implicits._
    // 3x2 raster "abcdef": keep (x even, y even) -> y=0: a,c -> "ac"
    val img = Seq(Multimodal.ImageRow(1L, 3, 2, "abcdef".getBytes("UTF-8"))).toDS()
    val out = Multimodal.resize(img).collect().head
    assert((out.out_w, out.out_h, out.out_len) === (2L, 1L, 2L))
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(out.out_md5 === md.digest("ac".getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString)
    // corpus-wide: dims follow the typed metadata, plan stays narrow
    val plan = Multimodal.resize(Multimodal.imageTable(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"resize shuffled:\n$plan")
    assert(Multimodal.m03(spark, sf).count() === 500)
  }

  test("m04: extracted features are exact byte arithmetic") {
    val r = Multimodal.m04(spark, sf).filter(col("doc_id") === 0).collect().head
    val text = Tables.documents(spark, sf).filter(col("doc_id") === 0)
      .select("text").as[String](org.apache.spark.sql.Encoders.STRING).collect().head
    val bytes = text.getBytes("UTF-8")
    (0 until 8).foreach { k =>
      val exp = (bytes((k * bytes.length) / 8) & 0xff) / 256.0
      assert(r.getDouble(r.fieldIndex(s"f$k")) === exp, s"f$k")
    }
  }

  test("m06: audio fingerprints match a driver-side recompute; landmark pairs are never adjacent") {
    // independent recompute of the landmark pairs straight from text
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .filter(_.getLong(0) % 2 != 0)
      .map(r => r.getLong(0) -> r.getString(1))
    val w = Multimodal.FpWindow
    val expected = texts.flatMap { case (id, t) =>
      val bytes = t.getBytes("UTF-8")
      val nw = bytes.length / w
      val e = Array.tabulate(nw)(k =>
        (k * w until (k + 1) * w).map(i => (bytes(i) & 0xff).toLong).sum)
      val peaks = (1 until math.max(nw - 1, 1))
        .filter(k => e(k) > e(k - 1) && e(k) > e(k + 1))
      peaks.zip(peaks.drop(1)).map { case (k1, k2) =>
        (e(k1) / 256, e(k2) / 256, (k2 - k1).toLong, id)
      }
    }
    val expGroups = expected.groupBy { case (b1, b2, dt, _) => (b1, b2, dt) }
      .map { case (key, xs) =>
        key -> ((xs.length.toLong, xs.map(_._4).distinct.length.toLong, xs.map(_._4).min))
      }
    val got = Multimodal.m06(spark, sf).collect()
    assert(got.length === expGroups.size)
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(expGroups(key) === ((r.getLong(3), r.getLong(4), r.getLong(5))), s"fp $key")
      // two strict local maxima can never sit in adjacent windows
      assert(r.getLong(2) >= 2L, "landmark pair delta must be >= 2")
    }
    // the corpus's duplicated docs must collide on fingerprints
    assert(got.exists(_.getLong(4) > 1), "some fingerprint shared across docs")
  }

  test("m07: scene cuts match a driver-side recompute; detection is shuffle-free") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val fs = Multimodal.FrameSize
    val expected = texts.flatMap { case (id, t) =>
      val bytes = t.getBytes("UTF-8")
      val nf = (bytes.length + fs - 1) / fs
      val e = Array.tabulate(nf) { k =>
        (k * fs until math.min((k + 1) * fs, bytes.length))
          .map(i => (bytes(i) & 0xff).toLong).sum
      }
      (1 until nf).collect {
        case k if math.abs(e(k) - e(k - 1)) > Multimodal.CutThreshold =>
          (id, k.toLong, e(k - 1), e(k))
      }
    }.sortBy(x => (x._1, x._2))
    val got = Multimodal.m07(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected.toSeq)
    assert(got.nonEmpty)
    val plan = Multimodal.sceneCuts(Multimodal.mediaTable(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"cut detection shuffled:\n$plan")
  }

  test("x02: Welford typed UDAF matches built-in avg/var_samp") {
    Welford.register(spark)
    Tables.lineitem(spark, sf).createOrReplaceTempView("graft_x02_li")
    val rows = spark.sql(
      """SELECT l_returnflag, welford(l_quantity) AS w,
        |       avg(l_quantity) AS a, var_samp(l_quantity) AS v
        |FROM graft_x02_li GROUP BY l_returnflag""".stripMargin).collect()
    rows.foreach { r =>
      val w = r.getStruct(r.fieldIndex("w"))
      assert(math.abs(w.getDouble(0) - r.getDouble(2)) < 1e-9, "mean")
      assert(math.abs(w.getDouble(1) - r.getDouble(3)) / r.getDouble(3) < 1e-9, "var")
    }
  }

  test("x02: Welford single-element group yields NULL varSamp (var_samp parity)") {
    Welford.register(spark)
    import spark.implicits._
    Seq(("a", 1.0), ("b", 2.0), ("b", 4.0)).toDF("k", "x")
      .createOrReplaceTempView("graft_welford_single")
    val rows = spark.sql(
      """SELECT k, welford(x) AS w, var_samp(x) AS v
        |FROM graft_welford_single GROUP BY k ORDER BY k""".stripMargin).collect()
    val a = rows(0).getStruct(1)
    assert(a.getDouble(0) === 1.0)
    assert(a.isNullAt(1), "n=1 group must yield NULL varSamp, like var_samp")
    assert(rows(0).isNullAt(2), "sanity: built-in var_samp is NULL for n=1")
    val b = rows(1).getStruct(1)
    assert(math.abs(b.getDouble(1) - 2.0) < 1e-12)
  }
}
