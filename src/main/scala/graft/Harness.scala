package graft

import org.apache.spark.sql.SparkSession

/** Shared plumbing for the two driver-contract mains (Bench, Verify):
  * the JSON string escaper and the inter-query state drain. One source
  * of truth — these used to be per-file copies, and a fix to either
  * (e.g. the two-phase-GC rationale below) must not have to land in
  * several places to be real. */
object Harness {

  /** RDD ids the inter-query drain must NOT unpersist: session-scoped
    * memos (Pipeline.ccMemo's checkpointed CC labelings) register their
    * backing RDDs here. These frames are deliberately cross-query state —
    * tiny (one row per near-dup node) and the whole point of the memo is
    * surviving from l21's run to l53's — while everything else the drain
    * clears is per-query debt. Entries are removed by the memo's own
    * clear()/evictSince (which also unpersist); capacity overflow
    * RETIRES without unprotecting — retired blocks stay valid for any
    * already-handed-out frame until the drain itself (the quiescence
    * barrier) frees them via SessionMemos.releaseRetired, per
    * FrameMemo's validity contract.
    *
    * Keyed by (applicationId, rddId), not bare rddId: RDD ids restart
    * near 0 in every SparkContext, so a context stopped with its memos
    * uncleared would otherwise leave stale bare ids that silently shield
    * a NEW context's unrelated RDDs from the drain — the exact pinned-
    * storage leak the drain exists to prevent. Stale (oldApp, id) pairs
    * from an uncleared stopped context are inert (no live context shares
    * the applicationId) and bounded by memo capacity. */
  private val protectedRdds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Int)]()

  def protectRdds(sc: org.apache.spark.SparkContext, ids: Iterable[Int]): Unit =
    ids.foreach(id => protectedRdds.add((sc.applicationId, id)))

  def unprotectRdds(sc: org.apache.spark.SparkContext, ids: Iterable[Int]): Unit =
    ids.foreach(id => protectedRdds.remove((sc.applicationId, id)))

  /** Backing RDD ids of a (checkpointed) frame — the unit both the memo
    * registration and Fixpoint.release operate on. */
  def frameRddIds(df: org.apache.spark.sql.DataFrame): Seq[Int] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }

  /** JSON string escape: backslash, quote, and ALL control chars
    * (<0x20) — a tab or CR in builder-authored SQL or an exception
    * message would otherwise make the driver's json.load fail. */
  def jsonEscape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Parse the per-query seconds out of a Bench stdout capture (the
    * fresh-probe child's output): finds the one `{"metric":…}` line and
    * extracts its `queries` object. Total-function contract — any
    * malformed/empty input yields Seq.empty, never a throw, because the
    * probe is advisory: a parse failure must read as "probe didn't run",
    * not kill the sweep that just spent 20 minutes measuring. */
  def parseBenchQueries(out: String): Seq[(String, Double)] =
    parseJsonDoubleMap(
      out.linesIterator.find(_.startsWith("{\"metric\"")).getOrElse(""),
      "queries")

  /** Extract a flat {"name": number, ...} object field from a one-line
    * JSON document (Bench's own output format — names are [a-z0-9_]).
    * Same total-function contract as [[parseBenchQueries]]: malformed or
    * missing input yields Seq.empty, never a throw. */
  def parseJsonDoubleMap(json: String, field: String): Seq[(String, Double)] =
    "\"([a-z0-9_]+)\":([0-9]+\\.[0-9]+)".r
      .findAllMatchIn(
        ("\"" + field + "\":\\{([^}]*)\\}").r
          .findFirstMatchIn(json).map(_.group(1)).getOrElse(""))
      .map(m => m.group(1) -> m.group(2).toDouble).toSeq

  /** Overlap INDEPENDENT Spark actions (optimization guide §2.6): the
    * scheduler happily runs several jobs at once inside one application —
    * actions are only sequential because driver code calls them
    * sequentially. A sink-family builder is a chain of small write jobs
    * whose per-job tail (last task + commit + planning gap) leaves the
    * executor pool idle; submitting the independent ones from a small
    * thread pool lets the next job's tasks back-fill that tail. FIFO
    * scheduling (the default) gives exactly the back-fill behaviour.
    * At a LOWER core count the jobs simply share the pool — total CPU
    * work is unchanged, so the driver's scaling run is not penalized.
    * Every task is wrapped in Try and ALL completions are awaited before
    * the first failure (in argument order) is rethrown — so when the
    * exception reaches the caller no sibling write is still in flight
    * (a retrying caller's deleteRecursively/wipeLog cannot race a
    * half-dead batch; r15 ADVICE finding — the old Future.sequence
    * failed fast with siblings still running). The only path that can
    * leave tasks running is the 20-min timeout, which interrupts the
    * pool best-effort before propagating. */
  def inParallel[T](fs: Seq[() => T]): Seq[T] = {
    if (fs.sizeIs <= 1) fs.map(_())
    else {
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(math.min(fs.size, 8))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        val done =
          try scala.concurrent.Await.result(
            scala.concurrent.Future.sequence(
              fs.map(f => scala.concurrent.Future(scala.util.Try(f())))),
            scala.concurrent.duration.Duration(20, "min"))
          catch { case t: Throwable => pool.shutdownNow(); throw t }
        done.map(_.get) // all tasks COMPLETED; first failure rethrows
      } finally pool.shutdown()
    }
  }

  /** Full sweep-state drain. Caches pinned inside a query (l02
    * shingles, ODM explode levels) must not outlive its run — pinned
    * storage memory starves later sort-heavy runs of execution memory →
    * spills. clearCache() only empties the CacheManager; localCheckpoint
    * blocks (fixpoint iterates) bypass it and sit in storage memory
    * until driver GC collects the RDD reference, so they are unpersisted
    * explicitly. The GC is two-phase when `settleMs` > 0: the first
    * gc() queues the dead shuffle/broadcast weak refs, the
    * ContextCleaner thread then issues the removal RPCs, and the second
    * gc() collects what those released — one pass left later queries
    * paying 10+ s of organic GC for their predecessors' state. */
  def drain(spark: SparkSession, settleMs: Long): Unit = {
    // drain's caller asserts quiescence (nothing mid-consumption — every
    // unprotected RDD below gets unpersisted, which would break any plan
    // still in flight), so this is also the safe point to free frames the
    // memos retired on capacity overflow (held until now so handed-out
    // frames were never invalidated underneath a reader)
    SessionMemos.releaseRetired()
    spark.catalog.clearCache()
    val app = spark.sparkContext.applicationId
    spark.sparkContext.getPersistentRDDs.values
      .filterNot(r => protectedRdds.contains((app, r.id)))
      .foreach(_.unpersist(blocking = false))
    System.gc()
    if (settleMs > 0) {
      Thread.sleep(settleMs)
      System.gc()
    }
  }
}
