package graft

import org.apache.spark.sql.functions._

/** Properties of the semantic-curation family (graft.llm.Semantic) and
  * t09 session paths — the checks the DuckDB hash gate can't express:
  * brute-force equivalence, edit locality, cross-query consistency. */
class SemanticSpec extends SparkSuite {

  test("l62: source centroid cosines match an exact BigInt replay, every pair present") {
    val src = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sums = scala.collection.mutable.Map.empty[(String, Int), BigInt]
      .withDefaultValue(BigInt(0))
    val nDocs = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    Tables.embeddings(spark, sf).select("vec_id", "embedding").collect().foreach { r =>
      val s = src(r.getLong(0))
      nDocs(s) += 1
      r.getSeq[Float](1).zipWithIndex.foreach { case (x, i) =>
        sums((s, i)) += BigInt(math.floor(x.toDouble * 1e6 + 0.5).toLong)
      }
    }
    val srcs = nDocs.keys.toSeq.sorted
    val dims = 0 until 64
    def n2(s: String) = dims.map(d => sums((s, d)) * sums((s, d))).sum
    val expected = (for { i <- srcs.indices; j <- (i + 1) until srcs.length } yield {
      val (a, b) = (srcs(i), srcs(j))
      val dot = dims.map(d => sums((a, d)) * sums((b, d))).sum
      val cos = math.floor(dot.toDouble / (math.sqrt(n2(a).toDouble) *
        math.sqrt(n2(b).toDouble)) * 1e6 + 0.5) / 1e6
      (a, b) -> ((nDocs(a), nDocs(b), cos))
    }).toMap
    val out = llm.Semantic.l62(spark, sf)
    // dtype pin: the r8 bug was a DECIMAL(30,9) cos_sim with exactly-right
    // VALUES — only the driver's DuckDB hash (DOUBLE vs DECIMAL text) saw it
    assert(out.schema("cos_sim").dataType === org.apache.spark.sql.types.DoubleType)
    val got = out.collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))
    }.toMap
    assert(got === expected)
    // complete matrix in canonical order, cosines inside the unit ball
    assert(got.size === srcs.size * (srcs.size - 1) / 2)
    got.foreach { case ((a, b), (_, _, c)) =>
      assert(a < b && c >= -1.0 && c <= 1.0)
    }
  }

  test("l27 semdedup: verdicts match brute-force within-cluster pairwise scan") {
    val rows = llm.Semantic.l27(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    // brute force in plain Scala off the same inputs
    val emb = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cents = (1 to 16).map(c => c.toLong -> emb(c.toLong))
    def assign(v: Array[Float]): Long =
      cents.map { case (cid, cv) => (cid, cos(v, cv)) }
        .maxBy { case (cid, c) => (c, -cid) }._1
    val byCluster = emb.toSeq.groupBy { case (_, v) => assign(v) }
    val expectDup = byCluster.values.flatMap { members =>
      val sorted = members.sortBy(_._1)
      sorted.map { case (id, v) =>
        val dupOf = sorted.filter(_._1 < id)
          .filter { case (_, u) =>
            math.round(cos(u, v) * 1e6) / 1e6 >= 0.4 }
          .map(_._1).minOption
        id -> dupOf.getOrElse(-1L)
      }
    }.toMap
    assert(rows.length === emb.size)
    rows.foreach { case (id, cid, status, dupOf) =>
      assert(cid === assign(emb(id)), s"cluster of $id")
      assert(dupOf === expectDup(id), s"dup_of of $id")
      assert(status === (if (expectDup(id) >= 0) "dup" else "keep"))
    }
    assert(rows.count(_._3 == "dup") > 0, "corpus should contain semantic dups")
  }

  test("l28 cdc: chunks partition each document exactly") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(lower(col("text")), " ")).as("nw"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = llm.Semantic.l28(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    assert(chunks.keySet === docs.keySet)
    chunks.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to sorted.length), s"doc $doc idx gap")
      // contiguous, starting at word 1, covering all nw words
      var expectStart = 1L
      sorted.foreach { case (_, _, start, n) =>
        assert(start === expectStart, s"doc $doc start")
        assert(n >= 1, s"doc $doc empty chunk")
        expectStart += n
      }
      assert(expectStart - 1 === docs(doc).toLong, s"doc $doc coverage")
    }
  }

  test("l28 cdc: a prepended word re-chunks only the first chunk (edit locality)") {
    import spark.implicits._
    val texts = Tables.documents(spark, sf).filter(col("doc_id") <= 50)
      .select("doc_id", "text").as[(Long, String)].collect()
    val edited = texts.map { case (id, t) => (id, "zzedit " + t) }
    def md5s(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[String]] =
      llm.Semantic.chunkCdc(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(4)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val before = md5s(texts.toSeq.toDF("doc_id", "text"))
    val after = md5s(edited.toSeq.toDF("doc_id", "text"))
    before.keys.foreach { id =>
      // all chunks after the first boundary are byte-identical — only the
      // head chunk absorbed the edit (the CDC property fixed windows lack)
      assert(after(id).drop(1) === before(id).drop(1), s"doc $id tail chunks moved")
      assert(after(id).head !== before(id).head, s"doc $id head chunk must change")
    }
  }

  test("l46 dsir: log-weights match a from-scratch hashed-unigram-bag replay " +
      "and separate target from raw") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bucket(t: String): Int =
      (java.lang.Long.parseLong(md5Hex(t).take(6), 16) % 64).toInt
    val tokens = docs.flatMap { case (id, lang, text) =>
      text.toLowerCase.split(" ", -1).map(t => (id, lang == "en", bucket(t)))
    }
    val ct = Array.fill(64)(0L); val ca = Array.fill(64)(0L)
    tokens.foreach { case (_, tgt, b) => if (tgt) ct(b) += 1; ca(b) += 1 }
    val tt = ct.sum.toDouble; val ta = ca.sum.toDouble
    val llr = (0 until 64).map { b =>
      math.log(((ct(b) + 1) / (tt + 64)) / ((ca(b) - ct(b) + 1) / (ta - tt + 64)))
    }
    val expected = tokens.groupBy(_._1).map { case (id, ts) =>
      val terms = ts.groupBy(_._3).map { case (b, xs) => xs.size.toDouble * llr(b) }
      // engine-parallel summation order: sorted ascending
      val s = terms.toSeq.sorted.sum
      id -> (ts.size.toLong, math.floor(s * 1e6 + 0.5) / 1e6)
    }
    val got = llm.Semantic.l46(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length === docs.length)
    got.foreach { case (id, n, w) =>
      assert((n, w) === expected(id), s"doc $id")
    }
    // the score must actually discriminate: mean target weight above
    // mean raw weight (that is the whole point of importance weighting)
    val byLang = docs.map(d => (d._1, d._2 == "en")).toMap
    val (tgtW, rawW) = got.partition(g => byLang(g._1))
    assert(tgtW.map(_._3).sum / tgtW.length > rawW.map(_._3).sum / rawW.length,
      "target docs must score higher on average")
  }

  test("l29 perplexity: matches a from-scratch unigram cross-entropy") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1).toSeq)
    val counts = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = counts.values.sum.toDouble
    val got = llm.Semantic.l29(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.size === docs.length)
    docs.foreach { case (id, toks) =>
      val (n, avg) = got(id)
      assert(n === toks.length.toLong, s"doc $id token count")
      val want = toks.map(t => -math.log(counts(t) / total)).sum / toks.length
      assert(math.abs(avg - want) < 1e-6, s"doc $id score $avg vs $want")
      assert(avg > 0.0)
    }
  }

  test("t09 session paths: counts reconcile with t03 sessions") {
    val t03Sessions = operators.EventTime.t03(spark, sf).count()
    val paths = operators.EventTime.t09(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(paths.map(_._2).sum === t03Sessions,
      "every t03 session contributes exactly one path")
    val types = Tables.events(spark, sf)
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    paths.foreach { case (path, n, users) =>
      assert(n >= users, s"path $path: more distinct users than sessions")
      assert(path.split(">").forall(types), s"path $path has unknown event type")
    }
  }
}
