package graft

import org.apache.spark.sql.functions._

/** l03b (multi-probe LSH ANN) quality: candidates are a strict subset of
  * the corpus, and recall@10 against the exact scan (l03) is meaningful —
  * swept over the probe radius (the recall/latency dial) at ALL THREE
  * test scale factors, not just one. */
class AnnSpec extends SparkSuite {

  private val sfs = Seq(
    "sf0.001" -> "/root/testdata/sf0.001",
    "sf0.01" -> "/root/testdata/sf0.01",
    "sf0.1" -> "/root/testdata/sf0.1")

  test("multi-probe recall sweep: monotone in radius, useful at radius 1, exact at full radius") {
    for ((name, dir) <- sfs) {
      val emb = Tables.embeddings(spark, dir)
      val total = emb.count() - 1 // minus the probe row
      val exact = llm.Llm.l03(spark, dir).select("vec_id")
        .collect().map(_.getLong(0)).toSet
      val sweep = (0 to 4).map { r =>
        val ann = llm.Llm.annSearch(emb, k = 10, radius = r)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val probed = llm.Llm.annProbedCount(emb, radius = r)
        (r, exact.intersect(ann).size, probed)
      }
      info(s"$name recall@10 by radius: " +
        sweep.map { case (r, rec, p) => s"r=$r: $rec/10 ($p/$total probed)" }
          .mkString(", "))
      // recall never decreases as the radius widens
      sweep.map(_._2).sliding(2).foreach { case Seq(a, b) =>
        assert(b >= a, s"$name: recall not monotone in radius: $sweep")
      }
      // the default radius keeps useful recall everywhere
      assert(sweep(1)._2 >= 3, s"$name: radius-1 recall collapsed: ${sweep(1)}")
      // pruning is real at the default radius (5/16 of buckets scanned)
      assert(sweep(1)._3 < total * 2 / 3,
        s"$name: radius-1 probed ${sweep(1)._3} of $total")
      // full radius scans everything and recovers the exact answer
      assert(sweep(4)._2 === 10, s"$name: full-radius recall: ${sweep(4)}")
      assert(sweep(4)._3 === total)
    }
  }

  test("l49 filtered ANN: every hit satisfies the predicate, and pre-filter " +
      "recall beats post-filtering the unfiltered top-k") {
    for ((name, dir) <- sfs) {
      val got = llm.Llm.l49(spark, dir).collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      assert(got.nonEmpty)
      got.foreach { case (id, label) =>
        assert(label % 3 == 0, s"$name: vec $id label $label leaked through")
      }
      // post-filter route: unfiltered ANN top-10, then filter — with a
      // 1-in-3 predicate most of the k dies; pre-filter keeps k full
      val post = llm.Llm.annSearch(Tables.embeddings(spark, dir))
        .collect().map(r => (r.getLong(0), r.getInt(1)))
        .filter(_._2 % 3 == 0)
      assert(got.length >= post.length,
        s"$name: pre-filter (${got.length}) must not trail post-filter (${post.length})")
      assert(got.length === 10, s"$name: pre-filter should fill k")
    }
  }

  test("l55 recall eval: matches a brute-force replay; radius 4 is exact") {
    // replay at sf0.01 so the probe set (vec_id % 97 == 0) has >1 member
    val dir = "/root/testdata/sf0.01"
    val vecs = Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val planes = llm.Llm.Hyperplanes
    def sig(v: Array[Double]): Long =
      planes.zipWithIndex.map { case (h, j) =>
        var (d, i) = (0.0, 0)
        while (i < v.length) { d += v(i) * h(i); i += 1 }
        if (d >= 0) 1L << j else 0L
      }.sum
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (dot, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6 + 0.5) / 1e6
    }
    val sigs = vecs.map { case (id, v) => id -> sig(v) }.toMap
    val probes = vecs.filter(_._1 % 97 == 0)
    assert(probes.length > 1, "probe set degenerate at sf0.01")
    val radii = Seq(0L, 1L, 2L, 4L)
    // per radius: top-10 per probe among candidates within Hamming d
    val top = radii.map { r =>
      r -> probes.flatMap { case (pid, pv) =>
        vecs.filter { case (id, _) =>
          id != pid && java.lang.Long.bitCount(sigs(id) ^ sigs(pid)) <= r }
          .map { case (id, v) => (id, cos(v, pv)) }
          .sortBy { case (id, c) => (-c, id) }.take(10)
          .map { case (id, _) => (pid, id) }
      }.toSet
    }.toMap
    val exact = top(4L)
    val expected = radii.map { r =>
      val scanned = probes.map { case (pid, _) =>
        vecs.count { case (id, _) =>
          id != pid && java.lang.Long.bitCount(sigs(id) ^ sigs(pid)) <= r }
      }
      val nProbes = scanned.count(_ > 0).toLong
      val hits = top(r).count(exact.contains).toLong
      (r, nProbes, scanned.sum.toLong, hits,
        math.floor(hits.toDouble / exact.size * 1e6 + 0.5) / 1e6)
    }.toSet
    val got = llm.Llm.l55(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got === expected)
    // the saturating radius recovers all of its own ground truth
    val full = got.find(_._1 == 4L).get
    assert(full._5 === 1.0)
    // recall and scan cost both widen monotonically with the radius
    val byR = got.toSeq.sortBy(_._1)
    byR.sliding(2).foreach { case Seq(a, b) =>
      assert(b._5 >= a._5 && b._3 >= a._3, s"not monotone: $byR")
    }
  }

  test("l52 hard negatives: top-3 cross-label matches a brute-force replay") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (dot, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6 + 0.5) / 1e6
    }
    val expected = vecs.filter(_._1 % 500 == 0).flatMap { case (aid, av, albl) =>
      vecs.filter(_._3 != albl)
        .map { case (vid, vv, vlbl) => (vid, vlbl, cos(av, vv)) }
        .sortBy { case (vid, _, c) => (-c, vid) }
        .take(3).zipWithIndex
        .map { case ((vid, vlbl, c), i) => (aid, i + 1L, vid, vlbl, c) }
    }.toSet
    val got = llm.Llm.l52(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getInt(4), r.getDouble(5)))
      .toSet
    assert(got === expected)
    // every mined negative must actually cross the label boundary
    val anchorLbl = vecs.filter(_._1 % 500 == 0).map(v => v._1 -> v._3).toMap
    got.foreach { case (aid, _, _, nlbl, _) =>
      assert(nlbl != anchorLbl(aid), s"anchor $aid mined a same-label 'negative'")
    }
  }
}
