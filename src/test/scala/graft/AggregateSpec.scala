package graft

import org.apache.spark.sql.functions._

/** Correctness of the non-oracled aggregate surfaces. */
class AggregateSpec extends SparkSuite {

  test("a03: HLL approx distinct within 5% of exact at rsd=0.01") {
    val approx = operators.Aggregates.a03(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"flag $k: approx $a vs exact $e")
    }
  }

  test("percentile_approx tracks exact percentile within 1% (sketch path)") {
    Tables.lineitem(spark, sf).createOrReplaceTempView("graft_pa_li")
    val rows = spark.sql(
      """SELECT l_returnflag,
        |       percentile(l_extendedprice, 0.5) AS exact,
        |       percentile_approx(l_extendedprice, 0.5, 10000) AS approx
        |FROM graft_pa_li GROUP BY l_returnflag""".stripMargin).collect()
    rows.foreach { r =>
      val (e, a) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(a - e) / e < 0.01, s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("a13: merged HLL sketch estimates within 5% of exact region distinct counts") {
    import org.apache.spark.sql.functions._
    val est = operators.Pivots.a13(spark, sf).collect()
      .map(r => r.getAs[String]("r_name") -> r.getAs[Long]("est_customers").toDouble).toMap
    val exact = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name").agg(countDistinct("c_custkey").as("n")).collect()
      .map(r => r.getAs[String]("r_name") -> r.getAs[Long]("n")).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (region, n) =>
      val e = est(region)
      assert(math.abs(e - n) <= math.max(0.05 * n, 2.0),
        s"$region: estimate $e vs exact $n")
    }
  }

  test("a18: Count-Min never under-counts, and split-sketch merge equals the full sketch") {
    val rows = operators.Aggregates.a18(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // the one-sided CM guarantee
    rows.foreach { case (k, t, e) => assert(e >= t, s"$k under-counted: $e < $t") }
    // mergeability: sketches built on disjoint halves, merged by cell
    // addition, equal the single-pass sketch — the distributed contract
    import spark.implicits._
    val e = Tables.events(spark, sf).select(col("event_id"), col("event_type").as("k"))
    def sketchOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("k"),
        explode(expr(s"sequence(0, ${operators.Aggregates.CmDepth - 1})")).as("d"))
      .withColumn("cell", expr(operators.Aggregates.cmCell))
      .groupBy("d", "cell").agg(count(lit(1)).as("c"))
    def cellsOf(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getInt(0).toLong, r.getLong(1)) -> r.getLong(2)).toMap
    val full = cellsOf(sketchOf(e).collect())
    val h1 = cellsOf(sketchOf(e.filter(col("event_id") % 2 === 0)).collect())
    val h2 = cellsOf(sketchOf(e.filter(col("event_id") % 2 =!= 0)).collect())
    val merged = (h1.keySet ++ h2.keySet).map(k =>
      k -> (h1.getOrElse(k, 0L) + h2.getOrElse(k, 0L))).toMap
    assert(merged === full)
  }

  test("a21: weighted median matches a driver-side cumulative scan") {
    val rows = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val expected = rows.groupBy(_._1).map { case (f, xs) =>
      val byV = xs.groupBy(_._2).map { case (v, ys) =>
        v -> ys.map(y => BigDecimal(y._3)).sum
      }.toSeq.sortBy(_._1)
      val tot = byV.map(_._2).sum
      var cum = BigDecimal(0)
      val med = byV.find { case (_, w) => cum += w; cum * 2 >= tot }.get._1
      f -> (med, tot.toDouble)
    }
    val got = operators.Aggregates.a21(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got === expected)
  }

  test("a23: exact mode matches a driver replay; the tie rule is total") {
    val rows = Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = rows.groupBy(_._1).map { case (u, es) =>
      val counts = es.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
      val (mt, mn) = counts.toSeq.minBy { case (t, n) => (-n, t) }
      val tot = counts.values.sum
      u -> ((mt, mn, counts.size.toLong, mn * 1000000L / tot))
    }
    val got = operators.Aggregates.a23(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got === expected)
    // the tie rule must actually fire somewhere, or it is dead code
    val tied = rows.groupBy(_._1).values.exists { es =>
      val cs = es.groupBy(_._2).values.map(_.length)
      cs.count(_ == cs.max) >= 2
    }
    assert(tied, "no user has a tied mode — the tie-break is untested")
    // the mode's share can never be below a fair split
    got.values.foreach { case (_, _, k, share) =>
      assert(share >= 1000000L / k)
    }
  }

  test("a22: equi-depth histogram matches a driver-side replay; buckets partition the axis") {
    val rows = Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 1000.0 + 0.5).toLong))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (et, es) =>
      val hist = es.groupBy(_._2).map { case (vm, xs) => vm -> xs.length.toLong }
        .toSeq.sortBy(_._1)
      val tot = hist.map(_._2).sum
      var cumb = 0L
      hist.map { case (vm, w) =>
        val b = cumb * 8 / tot + 1
        cumb += w
        (et, vm, w, b)
      }.groupBy { case (_, _, _, b) => b }.toSeq.map { case (b, vs) =>
        (et, b) -> ((vs.map(_._3).sum, vs.length.toLong,
          vs.map(_._2).min / 1000.0, vs.map(_._2).max / 1000.0))
      }
    }.toMap
    val got = operators.Aggregates.a22(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got === expected)
    got.toSeq.groupBy(_._1._1).foreach { case (et, bs) =>
      val ord = bs.sortBy(_._1._2).map(_._2)
      // buckets tile the value axis in order, never overlapping, and the
      // fixture genuinely splits (ties could legally collapse buckets,
      // but a one-bucket histogram would mean the gate is untested)
      ord.sliding(2).foreach {
        case Seq((_, _, _, hi1), (_, _, lo2, _)) => assert(hi1 < lo2, s"$et buckets overlap")
        case _ => ()
      }
      assert(ord.length >= 2, s"$et collapsed to one bucket")
      // mass balance: every row lands in exactly one bucket
      val n = rows.count(_._1 == et).toLong
      assert(ord.map(_._1).sum === n)
    }
  }

  test("a20: bitmap distinct equals exact countDistinct; partial bitmaps merge") {
    import org.apache.spark.sql.functions._
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = operators.Aggregates.a20(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(g => g._1 -> g._2).toMap === exact)
    // mergeability: OR-ing two half-corpus bitmap sets equals the full
    // one — the incremental-distinct contract
    val e = Tables.events(spark, sf).select("event_type", "user_id", "event_id")
    def bitmaps(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("event_type"), expr("user_id div 64").as("bucket"))
      .agg(expr("bit_or(shiftleft(1L, CAST(user_id % 64 AS INT)))").as("bm"))
    val merged = bitmaps(e.filter(col("event_id") % 2 === 0))
      .unionAll(bitmaps(e.filter(col("event_id") % 2 === 1)))
      .groupBy("event_type", "bucket").agg(expr("bit_or(bm)").as("bm"))
      .groupBy("event_type")
      .agg(sum(bit_count(col("bm")).cast("bigint")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === exact)
  }

  test("a19: max_by/min_by argmax matches an explicit sort-based recompute") {
    val totals = Tables.events(spark, sf)
      .select("event_type", "user_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(t => (t._1, t._2))
      .map { case ((et, u), xs) =>
        val tot = xs.map(x => BigDecimal(x._3).setScale(4, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble
        (et, u, tot)
      }.toSeq
    val expected = totals.groupBy(_._1).toSeq.map { case (et, xs) =>
      val top = xs.maxBy(x => (x._3, x._2))
      val bot = xs.minBy(x => (x._3, x._2))
      (et, top._2, top._3, bot._2, bot._3)
    }.sortBy(_._1)
    val got = operators.Aggregates.a19(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === expected)
    // single aggregation pass: no Window/Sort below the final agg pair
    val plan = operators.Aggregates.a19(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"argmax must not fall back to a window:\n$plan")
  }

  test("hash functions: golden vectors (sha1/xxhash64/crc32 not oracled)") {
    val row = spark.sql(
      """SELECT md5('abc') AS m, sha1('abc') AS s1, sha2('abc', 256) AS s2,
        |       crc32(CAST('abc' AS BINARY)) AS c, xxhash64('abc') AS x""".stripMargin)
      .head()
    assert(row.getAs[String]("m") === "900150983cd24fb0d6963f7d28e17f72")
    assert(row.getAs[String]("s1") === "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(row.getAs[String]("s2") ===
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(row.getAs[Long]("c") === 891568578L)
  }
}
