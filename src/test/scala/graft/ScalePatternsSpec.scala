package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Scale-critical physical patterns pinned as plan assertions: bucketed
  * co-located joins (no exchange), dynamic partition pruning, and the
  * corrupt-record quarantine split (reference R2/R3 analogue).
  */
class ScalePatternsSpec extends SparkSuite {

  test("bucketed tables join with NO exchange on either side") {
    // warehouse.dir is a static conf; tables land in ./spark-warehouse
    // (gitignored) and are dropped at the end
    spark.sql("DROP TABLE IF EXISTS graft_li_b")
    spark.sql("DROP TABLE IF EXISTS graft_ord_b")
    Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("graft_li_b")
    Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("graft_ord_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_li_b")
        .join(spark.table("graft_ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle: bucketing pre-partitioned both
      // sides identically (only the final small aggregation exchanges)
      val joinSection = plan.substring(0, plan.indexOf("HashAggregate",
        plan.indexOf("SortMergeJoin").max(0)).max(plan.length - 1))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey")
        && !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still exchanges:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_li_b")
      spark.sql("DROP TABLE IF EXISTS graft_ord_b")
    }
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val base = Files.createTempDirectory("graft_dpp").toString
    Tables.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(s"$base/orders_p")
    val fact = spark.read.parquet(s"$base/orders_p")
    val dim = spark.range(1, 3).select((col("id") + 1996).cast("int").as("d_year"),
      concat(lit("y"), col("id")).as("d_name"))
    val prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try {
      val q = fact.join(dim, col("o_year") === col("d_year"))
        .filter(col("d_name") === "y1")
        .groupBy("d_name").agg(count(lit(1)).as("n"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning")
        || plan.contains("dynamicpruningexpression"),
        s"expected dynamic partition pruning:\n$plan")
    } finally spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", prev)
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // The no-code-changes answer to hot keys: AQE detects an oversized
    // shuffle partition at runtime and splits it across tasks. Thresholds
    // are lowered so the synthetic 90%-one-key skew triggers locally; the
    // salted two-phase aggregation (j13) remains the explicit variant for
    // aggregations, where AQE can't help.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 90% of left rows share key 0; payload pads partition size
      val left = spark.range(0, 60000).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
        concat(lit("x"), lpad(col("id").cast("string"), 64, "0")).as("payload"))
      val right = spark.range(0, 2000).select(col("id").as("k"),
        concat(lit("dim"), col("id").cast("string")).as("name"))
      // max(payload) keeps the wide column alive through the shuffle —
      // column pruning would otherwise shrink partitions below threshold
      val q = left.join(right, "k").groupBy("name")
        .agg(count(lit(1)).as("n"), max(col("payload")).as("p"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join split in the final plan:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter: selective dim filter prunes the fact side of a shuffle join") {
    // The non-partition-column analogue of DPP: a bloom filter built from
    // the filtered dim side is pushed into the fact scan, so at 100 TB the
    // big side drops non-joining rows BEFORE the shuffle. Thresholds are
    // lowered because local test data is far below the 10 MB/10 GB
    // defaults that gate injection on a real cluster.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val q = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("might_contain"),
        s"expected an injected bloom filter on the fact side:\n$optimized")
      assert(q.collect().map(_.getLong(1)).sum > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("observe(): pipeline telemetry rides the job, no second pass (R22/R25)") {
    // the reference logs per-import row/memory telemetry from a side
    // scheduler; Spark's Observation collects named aggregates ON the
    // already-running job — at 100 TB a separate metrics .count() would
    // be a second full scan
    val obs = org.apache.spark.sql.Observation("lineitem_stats")
    val df = Tables.lineitem(spark, sf)
      .observe(obs, count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(38,4)")).cast("double").as("sum_qty"))
      .filter(col("l_quantity") > 25.0)
    val filtered = df.count()
    val m = obs.get
    val base = Tables.lineitem(spark, sf)
      .agg(count(lit(1)), sum(col("l_quantity").cast("decimal(38,4)")).cast("double"))
      .head()
    assert(m("n_rows") === base.getLong(0)) // metrics see PRE-filter rows
    assert(m("sum_qty") === base.getDouble(1))
    assert(filtered < base.getLong(0))
  }

  test("corrupt-record quarantine: bad JSON rows split to a dead-letter side (R2/R3)") {
    val f = Files.createTempFile("graft_quarantine", ".jsonl")
    Files.writeString(f,
      """{"id": 1, "v": 10.5}
        |{"id": 2, "v": "not-a-double"}
        |this is not json at all
        |{"id": 4, "v": 2.25}
        |""".stripMargin)
    val df = spark.read
      .schema("id BIGINT, v DOUBLE, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(f.toString).cache()
    val good = df.filter(col("_corrupt_record").isNull).select("id", "v")
    val dead = df.filter(col("_corrupt_record").isNotNull).select("_corrupt_record")
    assert(good.collect().map(_.getLong(0)).toSet === Set(1L, 4L))
    assert(dead.count() === 2) // malformed value + non-json line
  }
}
