package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * $SPARK_GRAFT_SF_DIR, forcing full materialization through the noop
  * sink (a bare .count() would let Catalyst prune projections and
  * undercount the real work).
  *
  * Emits ONE compact JSON line: total seconds, the slowest 25 per-query
  * times (3 decimals), query/failure counts, and a `failed` array. A
  * query that throws is excluded from the total and listed in `failed` —
  * a near-zero elapsed for a broken query must not read as a fast
  * success. The line is kept well under 2 KB so a log-tail capture
  * always contains it whole; the full per-query map goes to
  * bench_full.json in the working directory.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // comma-separated id filter for fresh-JVM single-query triage;
    // unset = the full inventory (the driver's mode)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ContextCleaner frees shuffle files / broadcast blocks only when
      // driver GC collects their weak refs; with an 8 GB heap a full GC
      // may not happen for hundreds of query runs, so ~340 executions'
      // worth of shuffle state accumulates (the default periodic-GC
      // interval is 30 min — longer than the whole bench). One-minute
      // periodic GC + the explicit gc() between queries below keep the
      // cleaner draining, so late queries measure the query, not the
      // accumulated debt of the 100 before it.
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up EVERY query once at the smallest SF: whole-stage codegen
    // compiles per plan shape, so the compiled classes are reused at the
    // measured SF and per-query numbers measure the query, not javac.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      SparkEntry.queries.filter(q => only.forall(_(q._1))).foreach { case (_, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    System.gc() // drop the warmup runs' shuffle state before timing
    // best-of-2: a single pass is at the mercy of one ill-timed GC pause
    // (observed 20× spikes); min-of-two is the standard stable estimator.
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        name: String): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        None
      }
    }
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime.max(0L)).sum
    }
    val results = SparkEntry.queries.filter(q => only.forall(_(q._1)))
      .toSeq.sortBy(_._1).map { case (name, fn) =>
      val gc0 = gcMillis()
      val best = (once(fn, name), once(fn, name)) match {
        case (Some(a), Some(b)) => Some(math.min(a, b))
        case _ => None
      }
      val gcSec = (gcMillis() - gc0) / 1e3
      // caches pinned inside a query (l02 shingles, ODM explode levels)
      // must not outlive its measurement: pinned storage memory starves
      // later sort-heavy queries of execution memory → spills (the
      // round-2 u*/w* 10-90× cliff). Each query measures from a clean
      // block manager; the explicit gc() lets the ContextCleaner drop
      // this query's shuffle files before the next one is timed.
      spark.catalog.clearCache()
      // clearCache() only empties the CacheManager — localCheckpoint
      // blocks (l21/l25 fixpoint iterates, checkpointed query results)
      // bypass it and otherwise sit in storage memory until driver GC
      // happens to collect the RDD reference. Drop them deterministically.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      // two-phase drain: the first gc() queues the dead shuffle/broadcast
      // weak refs, the ContextCleaner thread then issues the actual
      // removeShuffle/removeBroadcast RPCs, and the second gc() collects
      // what those released. One pass left the l-block queries paying
      // 10+ s of organic GC for their predecessors' state.
      System.gc()
      Thread.sleep(200)
      System.gc()
      (name, best, gcSec)
    }
    val ok = results.collect { case (n, Some(t), _) => n -> t }
    val failed = results.collect { case (n, None, _) => n }
    val gcByQuery = results.collect { case (n, Some(_), g) => n -> g }
    val total = ok.map(_._2).sum
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
    def f3(d: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    def qsJson(entries: Seq[(String, Double)]) = entries
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")
    val slowest = ok.sortBy(-_._2).take(25).sortBy(_._1)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":${f3(total)},"unit":"sec",""" +
      s""""queries":${qsJson(slowest)},"n_queries":${results.size},""" +
      s""""n_failed":${failed.size},"failed":$failedJson,"sf":"$sfDir"}"""
    // full per-query map for offline analysis (not size-constrained);
    // gc_sec = driver-JVM GC time attributed to each query's two runs —
    // a query that is slow here but fast in isolation with high gc_sec
    // is a memory-pressure victim, not a bad plan
    // provenance: an in-harness sweep (driver's sbt JVM, possibly a
    // different -Xmx) and a fresh standalone run produce different
    // numbers for the same code — the heap size + thread count recorded
    // here lets a reader tell which environment produced this file
    // instead of reconstructing it from timestamps
    val ctx = s""""context":{"xmx_mb":${Runtime.getRuntime.maxMemory() >> 20},""" +
      s""""cpus":$cpus,"java":"${System.getProperty("java.version")}"}"""
    val full = s"""{"total":${f3(total)},$ctx,"queries":${qsJson(ok)},""" +
      s""""gc_sec":${qsJson(gcByQuery)},""" +
      s""""failed":$failedJson,"sf":"$sfDir"}"""
    // a filtered triage run must not clobber the full sweep's record
    if (only.isEmpty) {
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
        full.getBytes("UTF-8"))
      // per-round archive (bench_full.json alone is clobbered each sweep,
      // losing round-over-round per-query history): current round =
      // highest driver-written BENCH_rNN.json + 1
      val rounds = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
        .flatMap(f => "BENCH_r(\\d+)\\.json".r.findFirstMatchIn(f.getName))
        .map(_.group(1).toInt)
      val round = if (rounds.isEmpty) 0 else rounds.max + 1
      java.nio.file.Files.write(
        java.nio.file.Paths.get(f"bench_full_r$round%02d.json"),
        full.getBytes("UTF-8"))
    }
    println(line)
    spark.stop()
  }
}
