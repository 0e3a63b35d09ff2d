package graft

import graft.llm.{Quantize, Spans}
import org.apache.spark.sql.functions._

/** l38 span dedup and l39 embedding quantization, each checked against an
  * INDEPENDENT driver-side recomputation from the raw tables (the l34
  * pattern: same inputs, different code path — a shared bug would have to
  * be written twice). */
class SpanQuantSpec extends SparkSuite {

  test("l38: per-doc span stats match a driver-side recomputation") {
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val k = Spans.SpanTokens
    // independent recompute: span hash -> distinct docs, then per-doc stats
    val spansByDoc: Map[Long, Seq[(Int, String)]] = texts.map { case (id, t) =>
      val a = t.split(" ")
      val ss = if (a.length < k) Seq.empty[(Int, String)]
        else (0 to a.length - k).map(i => i -> md5Hex(a.slice(i, i + k).mkString(" ")))
      id -> ss
    }
    val docFreq = spansByDoc.toSeq.flatMap { case (id, ss) => ss.map(s => (s._2, id)) }
      .groupBy(_._1).map { case (h, xs) => h -> xs.map(_._2).distinct.size }
    val expected = texts.map { case (id, t) =>
      val nTokens = t.split(" ").length
      val ss = spansByDoc(id)
      val dup = ss.filter(s => docFreq(s._2) >= Spans.MinDocs)
      val covered = dup.flatMap { case (p, _) => p until (p + k) }.distinct.size
      id -> ((nTokens.toLong, ss.size.toLong, dup.size.toLong, covered.toLong))
    }
    val got = Spans.l38(spark, sf).collect()
    assert(got.length === texts.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val (nt, ns, nd, cov) = expected(id)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
        ((nt, ns, nd, cov)), s"doc $id")
      assert(r.getDouble(5) === cov.toDouble / nt, s"doc $id ratio")
    }
    // the synthetic corpus has injected duplicates: the stat must be
    // non-degenerate (some spans duplicated, not all)
    val dupDocs = got.count(_.getLong(3) > 0)
    assert(dupDocs > 0 && dupDocs < got.length)
  }

  test("l38: coverage union never exceeds span count bounds") {
    Spans.l38(spark, sf).collect().foreach { r =>
      val (nt, ns, nd, cov) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nd <= ns)
      assert(cov <= nt, "covered positions bounded by doc length")
      assert(nd == 0L || cov >= Spans.SpanTokens,
        "any dup span covers at least one full window")
    }
  }

  test("l39: codes and quantized top-k match a driver-side recomputation") {
    val rows = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val dims = Quantize.Dims
    val mn = Array.tabulate(dims)(d => rows.map(_._2(d)).min.toDouble)
    val mx = Array.tabulate(dims)(d => rows.map(_._2(d)).max.toDouble)
    def code(v: Array[Float]): Array[Long] = Array.tabulate(dims) { d =>
      if (mx(d) == mn(d)) 0L
      else math.round((v(d).toDouble - mn(d)) * 254.0 / (mx(d) - mn(d)))
    }
    val codes = rows.map { case (id, v) => id -> code(v) }.toMap
    val expected = (0L to Quantize.Probes.toLong).flatMap { p =>
      val qp = codes(p)
      codes.toSeq.map { case (id, q) =>
        (p, id, q.zip(qp).map { case (a, b) => a * b }.sum)
      }.sortBy { case (_, id, dot) => (-dot, id) }
        .take(Quantize.TopK).zipWithIndex
        .map { case ((pp, id, dot), i) => (pp, id, dot, i + 1) }
    }
    val got = Quantize.l39(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq === expected)
    // codes stay in the declared 8-bit range
    import spark.implicits._
    val out = Quantize.coded(Tables.embeddings(spark, sf))
      .select(explode($"q").as("c"))
      .agg(min("c"), max("c")).head()
    assert(out.getInt(0) >= 0 && out.getInt(1) <= 254)
  }

  test("l40: PQ codes/ADC match a driver-side recompute; codebook vectors self-code") {
    val rows = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val byId = rows.toMap
    val cents = (1 to Quantize.PqK).map(c => byId(c.toLong))
    def subDist(v: Array[Float], c: Array[Float], m: Int): Long =
      (1 to Quantize.SubDim).map { d =>
        val diff = v(m * Quantize.SubDim + d - 1).toDouble -
          c(m * Quantize.SubDim + d - 1).toDouble
        math.round(diff * diff * 1e9)
      }.sum
    def distRow(v: Array[Float]): Array[Array[Long]] =
      Array.tabulate(Quantize.SubSpaces)(m => cents.map(c => subDist(v, c, m)).toArray)
    def codesOf(v: Array[Float]): Array[Int] =
      distRow(v).map(ds => ds.indexOf(ds.min) + 1)
    val lt = distRow(byId(0L))
    val expected = rows.map { case (id, v) =>
      val cs = codesOf(v)
      (id, cs.mkString("-"),
        cs.zipWithIndex.map { case (c, m) => lt(m)(c - 1) }.sum)
    }.sortBy(_._1)
    val got = Quantize.l40(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === expected.toSeq)
    // a codebook seed vector's nearest centroid in every subspace is
    // itself (exact zero distance), so its code is its own index
    (1 to Quantize.PqK).foreach { c =>
      val code = got(got.indexWhere(_._1 == c.toLong))._2
      assert(code === Array.fill(Quantize.SubSpaces)(c).mkString("-"), s"centroid $c")
    }
  }

  test("l44: IVF-PQ equals PQ ranking restricted to the probed coarse lists") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    graft.functions.VecMath.register(spark2)
    val emb = Tables.embeddings(spark2, sf)
    // routing truth from the same assignment step l03c/l26 pin
    val coarse = emb.filter(col("vec_id").between(1, Quantize.PqK))
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val assignment = graft.llm.Dedup
      .kmeansAssign(emb.filter(col("vec_id") =!= 0), coarse)
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Quantize.l44(spark2, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 10)
    val probed = got.map(_._2).distinct
    assert(probed.length <= Quantize.NProbe)
    // every returned row sits in a probed list, per the assignment step
    got.foreach { case (id, cid, _) => assert(assignment(id) === cid, s"vec $id") }
    // independent PQ/ADC recompute over the probed lists' candidates:
    // the returned 10 must be exactly the ascending-ADC head
    val rows = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val cb = (1 to Quantize.PqK).map(c => rows(c.toLong))
    def subDist(v: Array[Float], c: Array[Float], m: Int): Long =
      (0 until Quantize.SubDim).map { d =>
        val i = m * Quantize.SubDim + d
        val diff = v(i).toDouble - c(i).toDouble
        math.round(diff * diff * 1e9)
      }.sum
    val lt = Array.tabulate(Quantize.SubSpaces, Quantize.PqK)((m, c) =>
      subDist(rows(0L), cb(c), m))
    val expected = assignment.toSeq
      .filter { case (_, cid) => probed.contains(cid) }
      .map { case (id, cid) =>
        val v = rows(id)
        val adist = (0 until Quantize.SubSpaces).map { m =>
          val ds = (0 until Quantize.PqK).map(c => subDist(v, cb(c), m))
          lt(m)(ds.indexOf(ds.min))
        }.sum
        (id, cid, adist)
      }.sortBy { case (id, _, ad) => (ad, id) }.take(10)
    assert(got.toSeq === expected)
  }

  test("l39/l38 plans: bounds and probes broadcast; span shuffle carries the hash") {
    val qplan = Quantize.l39(spark, sf).queryExecution.executedPlan.toString
    assert(qplan.contains("BroadcastNestedLoopJoin") || qplan.contains("BroadcastExchange"),
      s"probe/bounds side must broadcast:\n$qplan")
    val splan = Spans.l38(spark, sf).queryExecution.optimizedPlan.toString
    // the shuffled span stream projects the md5, never the token array
    assert(splan.contains("md5"), s"span key must be hashed:\n$splan")
  }
}
