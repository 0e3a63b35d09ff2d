package graft

import org.apache.spark.sql.functions._

/** s12 Z-order sink (file-level skipping evidence), a16 robust outliers
  * (local recompute), l25 incremental dedup (consistency with l02). */
class LayoutSpec extends SparkSuite {

  test("s16: ANALYZE statistics reach the optimizer (CBO rowCount + column stats)") {
    operators.Scans.s16(spark, sf).collect() // registers + analyzes the table
    val t = s"${Tables.scratchPath("s16_stats", sf).split('/').last}_lineitem"
    val expected = Tables.lineitem(spark, sf).count()
    val prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table(t).queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(expected)),
        s"catalog rowCount must reach the optimizer: ${stats.rowCount}")
      val colStats = stats.attributeStats.find(_._1.name == "l_orderkey").map(_._2)
      assert(colStats.exists(s => s.min.isDefined && s.max.isDefined),
        s"analyzed column stats must reach the optimizer: ${stats.attributeStats}")
    } finally spark.conf.set("spark.sql.cbo.enabled", prev)
  }

  test("s12: Morton zval matches a bit-by-bit reference implementation") {
    def mortonRef(p: Long, s: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((p >> i) & 1L) << (2 * i)
        z |= ((s >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"),
        operators.Scans.zval(col("l_partkey"), col("l_suppkey")).as("z"))
      .limit(500).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) === mortonRef(r.getLong(0), r.getLong(1)),
        s"zval mismatch for (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("s12: z-ordered layout prunes the 2-D box to fewer files than a 1-D sort") {
    // the query itself writes the z-clustered files
    operators.Scans.s12(spark, sf).collect()
    val zdir = Tables.scratchPath("s12_zorder", sf)
    // contrast layout: same data, classic single-key (orderkey) sort
    val plainDir = Tables.scratchPath("s12_plain", sf)
    Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(plainDir)
    // per-file key rectangles — exactly the stats parquet min/max skipping
    // consults; a file can be skipped iff its rectangle misses the box
    def fileRects(dir: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    def hits(rects: Array[(Long, Long, Long, Long)]): Int =
      rects.count { case (pLo, pHi, sLo, sHi) =>
        pLo <= 50 && pHi >= 1 && sLo <= 10 && sHi >= 1
      }
    val zRects = fileRects(zdir)
    val plainRects = fileRects(plainDir)
    assert(zRects.length >= 4, s"expected several z files, got ${zRects.length}")
    // orderkey sort is uncorrelated with (partkey, suppkey): every file
    // spans the box; z-order confines the box to a strict minority
    assert(hits(plainRects) === plainRects.length)
    assert(hits(zRects) * 2 <= zRects.length,
      s"z layout should confine the box to <= half the files: " +
        s"${hits(zRects)}/${zRects.length}")
  }

  test("s15: compaction collapses the file count and range-clusters the key") {
    operators.Scans.s15(spark, sf).collect() // writes both dirs
    def files(dir: String): Array[String] =
      new java.io.File(dir).listFiles().map(_.getName)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
    val nFrag = files(Tables.scratchPath("s15_frag", sf)).length
    val compactDir = Tables.scratchPath("s15_compact", sf)
    val nCompact = files(compactDir).length
    info(s"fragmented=$nFrag files, compacted=$nCompact files")
    assert(nFrag >= nCompact * 2,
      s"compaction should collapse the file count: $nFrag -> $nCompact")
    assert(nCompact <= 8, s"range repartition(8) produced $nCompact files")
    // range clustering: per-file [min,max] orderkey intervals overlap only
    // at their boundary key (range partitioning splits ON a key value)
    val rects = spark.read.parquet(compactDir)
      .groupBy(input_file_name())
      .agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    rects.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(lo2 >= hi1, s"file ranges interleave: hi=$hi1 lo=$lo2")
      case _ => ()
    }
  }

  test("s18: mergeSchema read surfaces the evolved column as null on old generations") {
    import org.apache.spark.sql.functions._
    val out = operators.Scans.s18(spark, sf)
    // schema merged across generations; partition discovery typed gen
    assert(out.columns.toSeq ===
      Seq("o_orderkey", "o_totalprice", "o_orderpriority", "gen"))
    val byGen = out.groupBy("gen")
      .agg(count(lit(1)).as("n"),
        count(col("o_orderpriority")).as("n_prio"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val src = Tables.orders(spark, sf)
    val nF = src.filter(col("o_orderstatus") === "F").count()
    val nO = src.filter(col("o_orderstatus") === "O").count()
    // gen 1 predates the column: present in the merged schema, all null;
    // gen 2 carries it on every row — and nothing was dropped either side
    assert(byGen(1) === ((nF, 0L)), s"gen1: ${byGen(1)}")
    assert(byGen(2) === ((nO, nO)), s"gen2: ${byGen(2)}")
  }

  test("s18b: field-id read binds renamed columns and widens INT32 in ONE scan; " +
      "name-based matching provably cannot") {
    import org.apache.spark.sql.types._
    operators.Scans.s18b(spark, sf) // writes both generations
    val root = Tables.scratchPath("s18b_evolved", sf)
    // the gen-1 files genuinely store the OLD shape: INT32 key, old name
    val gen1 = spark.read.parquet(s"$root/gen=1").schema
    assert(gen1("o_orderkey").dataType === IntegerType)
    assert(gen1.fieldNames.contains("amount") && !gen1.fieldNames.contains("total_price"))
    // one scan over both generations (no per-generation union of reads) —
    // asserted on the LAZY shared read (s18b itself returns a checkpoint-
    // materialized frame so the global fieldId flag can be scoped/restored)
    val plan = operators.Scans.s18bRead(spark, root)
      .queryExecution.executedPlan.toString
    assert(plan.split("Scan parquet").length - 1 === 1,
      s"expected exactly one parquet scan:\n${plan.take(600)}")
    // mergeSchema CANNOT express the widening: the conflicting INT32/INT64
    // generations make the footer merge throw
    val merr = intercept[Exception] {
      spark.read.option("mergeSchema", "true").parquet(root).collect()
    }
    assert(merr.getMessage.toLowerCase.contains("merg"),
      s"expected a schema-merge failure, got: ${merr.getMessage.take(200)}")
    // and name-based matching CANNOT express the rename: with the id read
    // disabled, gen-1 rows lose their payload into a null half-column
    val readSchema = StructType(Seq(
      StructField("o_orderkey", LongType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 1L).build()),
      StructField("total_price", DoubleType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 2L).build()),
      StructField("gen", IntegerType, nullable = true)))
    val fidFlag = "spark.sql.parquet.fieldId.read.enabled"
    val fidPrior = spark.conf.getOption(fidFlag)
    spark.conf.set(fidFlag, "false")
    try {
      val byName = spark.read.schema(readSchema).parquet(root)
        .groupBy("gen").agg(count(col("total_price")).as("n_price"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(byName(1) === 0L, "name matching must NOT see gen-1's renamed column")
      assert(byName(2) > 0L)
    } finally fidPrior match { // restore the PRIOR value, not a constant
      case Some(v) => spark.conf.set(fidFlag, v)
      case None    => spark.conf.unset(fidFlag)
    }
    // the id-bound read sees every row's payload in the one column family
    val full = operators.Scans.s18b(spark, sf).collect()
    assert(full.map(_.getInt(0)).toSeq === Seq(1, 2))
    // key_sum lives in the widened BIGINT lane (at sf0.1 it exceeds
    // Int.MaxValue; at this spec's SF we pin type + value instead)
    val expect = Tables.orders(spark, sf).filter(col("o_orderstatus") === "F")
      .agg(sum("o_orderkey")).collect().head.getLong(0)
    assert(full.head.getLong(2) === expect)
  }

  test("s12: the box predicate reaches the parquet scan as pushed filters") {
    val zdir = Tables.scratchPath("s12_zorder", sf)
    operators.Scans.s12(spark, sf).collect() // ensure files exist
    // scan metadata strings (PushedFilters et al) truncate at 100 chars
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val plan = spark.read.parquet(zdir)
      .filter(col("l_partkey").between(1, 50) && col("l_suppkey").between(1, 10))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan.take(500))
    assert(plan.contains("GreaterThanOrEqual(l_partkey,1)")
      && plan.contains("LessThanOrEqual(l_suppkey,10)"),
      "range predicates must be pushed to the scan:\n" + plan.take(800))
  }

  test("s17: lineage sink writes exactly one file per partition dir and " +
      "every row's path agrees with its partition value") {
    val tmp = operators.Extras.s17Write(spark, sf)
    val dirs = new java.io.File(tmp).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_type="))
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"${d.getName}: expected 1 file, got ${files.length}")
    }
    // the query's own consistency column must be total
    operators.Extras.s17(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_path_consistent") === r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("n_files") === 1L)
    }
  }

  test("s19: the manifest layout skips to one file on a key-filtered read") {
    // one s19 run: rerunning it would overwrite the layout (new file
    // names) under any DataFrame still reading the first generation
    val manifest = operators.Scans.s19(spark, sf).collect()
    val tmp = Tables.scratchPath("s19_manifest", sf)
    val all = spark.read.parquet(tmp)
    val totalFiles = all.inputFiles.length
    assert(totalFiles >= 10, s"fixture too small to prove skipping: $totalFiles files")
    // partition pruning must reduce the scan to exactly the one file the
    // filtered month lives in — the data-skipping contract. Two halves:
    // the plan carries the partition filter (pruning is PLANNED, not a
    // post-scan filter), and every surviving row comes from one file
    // (inputFiles/scan metrics are unreliable under AQE plan reuse).
    val pruned = all.filter(col("ship_month") === "1997-03")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(ship_month"),
      s"expected a ship_month partition filter, got:\n$plan")
    val files = pruned.select(col("_metadata.file_path")).distinct().collect()
    assert(files.length === 1, s"expected rows from 1 file, got ${files.length}")
    assert(pruned.count() > 0)
    // and the manifest's zone map brackets every row of its partition
    val m = manifest.find(_.getAs[String]("ship_month") == "1997-03").get
    val (lo, hi) = (m.getAs[java.time.LocalDateTime]("min_shipdate"),
      m.getAs[java.time.LocalDateTime]("max_shipdate"))
    val out = pruned.agg(min("l_shipdate"), max("l_shipdate")).collect().head
    assert(out.getAs[java.time.LocalDateTime](0) == lo
      && out.getAs[java.time.LocalDateTime](1) == hi)
  }

  test("s20: incrementally merged manifest equals a from-scratch recompute") {
    val got = operators.Scans.s20(spark, sf).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.get(2), r.get(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    }.toMap
    // from-scratch single-pass stats over the full table — if the monoid
    // merge dropped a batch, double-counted, or mixed months, some stat
    // diverges here
    val full = Tables.lineitem(spark, sf)
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("m"))
      .agg(count(lit(1)), min("l_shipdate"), max("l_shipdate"),
        min("l_extendedprice"), max("l_extendedprice"))
      .collect().map { r =>
        r.getString(0) -> ((r.getLong(1), r.get(2), r.get(3),
          r.getDouble(4), r.getDouble(5)))
      }.toMap
    assert(got.keySet === full.keySet)
    got.foreach { case (m, (n, lo, hi, plo, phi, batches)) =>
      assert((n, lo, hi, plo, phi) === full(m), s"month $m diverged")
      assert(batches >= 1L && batches <= 2L)
    }
    // the late batch must actually touch months the base batch owns, or
    // the merge path is never exercised
    assert(got.values.exists(_._6 == 2L), "no month saw both batches")
  }

  test("s21: the AS-OF-1 read plans only batch-1 files; snapshots differ by the late batch") {
    val manifest = operators.Scans.s21Commit(spark, sf)
    val batches = manifest.select("batch").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(batches === Set(1, 2), s"manifest must carry both commits: $batches")
    // the snapshot-read contract: the planned file set of the AS-OF-1
    // scan is exactly the manifest's batch-1 files — later commits are
    // invisible to the plan, not filtered after the scan
    // compare as filesystem paths — inputFiles renders file:/ while
    // _metadata.file_path renders file:///; same file, different URI form
    def asPath(u: String): String = new java.net.URI(u).getPath
    val snap1 = operators.Scans.s21AsOf(spark, manifest, 1)
    val planned = snap1.inputFiles.map(asPath).toSet
    val batch1Files = manifest.filter(col("batch") === 1)
      .select("path").collect().map(r => asPath(r.getString(0))).toSet
    assert(planned.nonEmpty && planned === batch1Files,
      s"AS-OF-1 planned ${planned.size} files, manifest batch-1 has ${batch1Files.size}")
    assert(planned.forall(_.contains("batch=1")),
      s"AS-OF-1 plan touched a non-batch-1 file: ${planned.find(!_.contains("batch=1"))}")
    // row-level: snapshot 2 minus snapshot 1 is exactly the late batch
    val snap2 = operators.Scans.s21AsOf(spark, manifest, 2)
    val onlyLate = snap2.exceptAll(snap1)
    assert(onlyLate.filter(pmod(col("l_orderkey"), lit(10)) =!= 0).count() === 0L,
      "a base-batch row appeared only in snapshot 2")
    assert(snap1.filter(pmod(col("l_orderkey"), lit(10)) === 0).count() === 0L,
      "a late-batch row leaked into snapshot 1")
    assert(snap1.count() + onlyLate.count() === snap2.count())
    // a snapshot id before the first commit fails with the contract named
    val ex = intercept[IllegalArgumentException] {
      operators.Scans.s21AsOf(spark, manifest, 0)
    }
    assert(ex.getMessage.contains("predates"))
    graft.Fixpoint.release(manifest)
  }

  test("a16: median/MAD/outlier profile matches a local recompute") {
    val got = operators.Aggregates.a16(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toMap
    val cents = Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val expected = cents.groupBy(_._1).map { case (et, vs) =>
      val xs = vs.map(_._2.toDouble).toSeq
      val med = medianOf(xs)
      val devs = xs.map(x => math.abs(x - med))
      val mad = medianOf(devs)
      val out = devs.count(_ > 3.0 * 1.4826 * mad).toLong
      et -> ((xs.length.toLong, med, mad, out))
    }
    assert(got.keySet === expected.keySet)
    expected.foreach { case (et, exp) =>
      assert(got(et) === exp, s"group $et: got ${got(et)}, expected $exp")
    }
    // robust rule must flag a bounded minority, not the bulk
    got.values.foreach { case (n, _, _, out) => assert(out * 4 <= n) }
  }

  test("l25: verdicts are consistent with l02's corpus-wide near-dup pairs") {
    val verdicts = llm.Llm.l25(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // every new doc gets exactly one verdict
    val newIds = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(verdicts.keySet === newIds)
    // l02 pairs with one new and one historical endpoint
    val mixed = llm.Llm.l02(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a % 10 == 0) != (b % 10 == 0) }
    val newWithMixedPair = mixed.map { case (a, b) => if (a % 10 == 0) a else b }.toSet
    // bands and the verify threshold are identical, so the near-dup sets
    // coincide: non-unique in l25 <=> has a mixed l02 pair (exact md5
    // dups of >=3-word docs are jaccard-1 pairs and collide in all bands)
    val nonUnique = verdicts.collect { case (id, s) if s != "unique" => id }.toSet
    newWithMixedPair.foreach { id =>
      assert(verdicts(id) != "unique", s"doc $id has a mixed l02 pair but l25 says unique")
    }
    nonUnique.filter(id => verdicts(id) == "near_dup").foreach { id =>
      assert(newWithMixedPair.contains(id), s"doc $id near_dup but no mixed l02 pair")
    }
  }
}
