package graft.streaming

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** t30: STREAMING→LAKEHOUSE INGEST — the production ingest-writer shape,
  * registered and hash-gated like every batch operator. A Structured
  * Streaming file source drains the events table in three micro-batches
  * (maxFilesPerTrigger=1 over three staged chunk files, Trigger
  * .AvailableNow); foreachBatch folds each batch's per-type stats into
  * the s24 optimistic commit log (put-if-absent version pointers, monoid
  * merge — Lakehouse.s24Writer verbatim). The registered result is the
  * FINAL committed manifest, which must equal the one-shot batch stats:
  * the oracle restates exactly that, so the composed
  * stream→commit-protocol path is proven equivalent to a single batch
  * job, the invariant that makes micro-batch ingest trustworthy.
  *
  * Scale shape: each micro-batch's work is one map-side-combinable
  * aggregate over the batch plus a KB-sized manifest merge and an O(1)
  * pointer commit — state between batches lives in the log's parquet
  * manifest, not in executor memory, so the writer restarts from the
  * last committed version with nothing to rebuild (StreamingSpec pins
  * restart/exactly-once on the same composition with MemoryStream).
  *
  * Reference mapping: this is the Spark-native image of the reference's
  * broker consumer loop persisting batch results (broker.clj:65-95 +
  * store.clj:21-34) — there the state store is MongoDB; here the engine
  * owns its files, so the sink is the commit log.
  */
object StreamCommit extends QueryModule {

  private def rmrf(p: String): Unit = {
    def go(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(go))
      f.delete(); ()
    }
    go(new java.io.File(p))
  }

  def t30(spark: SparkSession, dir: String): DataFrame = {
    val root = Tables.scratchPath("t30_stream", dir)
    val (chunks, log, stage, ckpt) =
      (s"$root/chunks", s"$root/log", s"$root/stage", s"$root/ckpt")
    // a rerun must replay the protocol from v0 with fresh batch ids —
    // stale checkpoint/log state would skip batches or append versions
    Seq(chunks, log, ckpt).foreach(rmrf)
    val e = Tables.events(spark, dir).select("event_id", "event_type", "value")
    // stage three single-file chunks: the deterministic image of three
    // arriving ingest files (every event_id%3 class is non-empty at all
    // fixture SFs — TestdataContractSpec pins the table's size floor)
    for (g <- 0 until 3)
      e.filter(pmod(col("event_id"), lit(3)) === g)
        .repartition(1).write.mode("append").parquet(chunks)
    // s24's manifest schema (monoid merge on the key column, there named
    // ship_month) — the monoid, not the name, is the contract
    def stats(df: DataFrame): DataFrame = df
      .groupBy(col("event_type").as("ship_month"))
      .agg(count(lit(1)).cast("bigint").as("n_rows"),
        min("value").as("min_price"), max("value").as("max_price"))
    val q = spark.readStream
      .schema(spark.read.parquet(chunks).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(chunks)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, id: Long) =>
        graft.operators.Lakehouse
          .s24Writer(spark, log, s"$stage/$id", stats(df), s"mb$id")
        ()
      }.start()
    q.awaitTermination()
    val v = graft.operators.Lakehouse.s24Current(log)
    require(v >= 0, "the stream committed nothing")
    graft.operators.Lakehouse.s24Read(spark, log, v)
      .select(col("ship_month").as("event_type"), col("n_rows"),
        col("min_price").as("min_value"), col("max_price").as("max_value"))
      .withColumn("final_version", lit(v))
      .orderBy("event_type")
  }

  // stream→commit queries stage chunk files and write the commit log
  override def sinkQueries: Set[String] = queries.keySet

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("t30_stream_commit" -> t30)

  val oracles: Map[String, String] = Map(
    // the final committed manifest == one-shot batch stats over the whole
    // table, at version 2 (three staged files → three micro-batches →
    // commits v0,v1,v2) — equality proves no batch was lost, doubled, or
    // mis-merged across the commit protocol
    "t30_stream_commit" ->
      """SELECT event_type, COUNT(*) AS n_rows,
        |       MIN(value) AS min_value, MAX(value) AS max_value,
        |       2 AS final_version
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
}
