package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md / FIXTURES.md).
  *
  * All relational queries go through here so scan concerns (schema quirks,
  * pushdown-friendly column shapes) are solved once. At 100 TB these would be
  * catalog tables; the parquet-dir indirection keeps the same call shape.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** events loader, adaptive to how the driver generated `ts`:
    *   - parquet TIMESTAMP(MICROS/MILLIS) → Spark reads a (ntz) timestamp;
    *   - parquet TIMESTAMP(NANOS) → Spark's reader rejects it
    *     ([PARQUET_TYPE_ILLEGAL]) unless nanos are read as a raw long
    *     (legacy conf), which we enable up front (no-op for µs files).
    * Either way the derived columns every event-time query consumes are:
    *   - ts_ms   : long, epoch millis (floor)
    *   - event_ts: timestamp at millisecond precision (UTC session).
    * Millisecond flooring keeps values exactly reproducible by the DuckDB
    * oracle (epoch_ns(ts)//1000000 — exact for both ns and µs storage).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    val tsMs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
      case _                                   => epochMs(col("ts"))
    }
    raw.withColumn("ts_ms", tsMs)
      .withColumn("event_ts", timestamp_millis(col("ts_ms")))
  }

  /** Scratch path for sink round-trip queries, unique per input dir
    * (md5-derived — Int hashCode collides across distinct dirs). Only the
    * three fixed testdata SF dirs occur in practice, so accumulation in
    * tmpdir is bounded. */
  def scratchPath(name: String, dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    s"${System.getProperty("java.io.tmpdir")}/graft_${name}_$h"
  }

  /** Epoch milliseconds of a (ntz) timestamp column under the UTC session —
    * the cross-engine-portable image of a time value (DuckDB: epoch_ms). */
  def epochMs(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unix_millis(c.cast("timestamp"))

  /** Total order over every output column in select order (DuckDB side:
    * ORDER BY ALL). Needed because the synthetic lineitem has no unique
    * key — (l_orderkey, l_linenumber) collides (TESTDATA sf0.001: 4599
    * distinct of 6000). Identical duplicate rows then sort adjacently in
    * both engines, making row-level outputs comparable.
    */
  def orderAll(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(col).toIndexedSeq: _*)

  /** Spread a small-scan frame across the session's cores before
    * per-row-heavy compute (optimization guide §2.5's "one unsplittable
    * input file → repartition immediately after the read", generalized
    * from Llm.spreadDocs). The fixture tables arrive as one small
    * parquet file each — typically ONE scan split, often one row group —
    * so an expensive per-row stage (gram hashing, regex gates, shingle
    * minhash) otherwise runs serially on one core no matter how many the
    * session has. The decision is planner metadata (no Spark job): a
    * scan already yielding at least half the default parallelism — any
    * at-scale input — passes through untouched, so the exchange exists
    * exactly where the alternative is a near-serial stage, and `key`
    * (a high-cardinality column) doubles as a useful downstream
    * partitioning where the next aggregate groups by it. */
  def spread(df: DataFrame, key: String): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= want) df
    // EXPLICIT partition count: repartition(col) alone leaves the count
    // to AQE, which coalesces a KB-sized exchange right back to one
    // partition — re-serializing the downstream stage the spread exists
    // to parallelize. The explicit N pins it; `want` tracks the session's
    // cores, so this is core-count-adaptive, not a tuned constant.
    else df.repartition(want, col(key))
  }

  /** Exact decimal image of a double column: deterministic accumulation
    * regardless of partitioning / summation order. Aggregate contract
    * (SURVEY.md §2.2): sum in DECIMAL(38,4), surface as DOUBLE.
    */
  def dec(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast(org.apache.spark.sql.types.DecimalType(38, 4))
}

/** One SURVEY.md §2.2 family = one module: `queries` keys land in
  * SparkEntry.queries, `oracles` (a subset of the keys) in oracleSql.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]

  /** The module's SINK-CLASS query ids: queries whose measured execution
    * WRITES real files beyond reading the fixture tables (lakehouse
    * lifecycle, parquet-state handoffs, sink round-trips). Bench splits
    * its published total into read-plan vs sink classes from this —
    * declared NEXT TO the queries themselves so a new file-writing query
    * cannot silently land in the read class by omission in a central
    * list (SparkEntry checks membership ⊆ the module's own keys). */
  def sinkQueries: Set[String] = Set.empty
}
