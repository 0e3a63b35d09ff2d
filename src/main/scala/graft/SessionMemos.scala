package graft

/** One clock + registry over every session-scoped memo in the library
  * (the FrameMemo instances behind the CC labeling and the MinHash pair
  * graph, Pipeline's BPE trainMemo, CorpusStats' count memo), so a
  * harness can reason about "memo state" as a single unit instead of
  * chasing per-module clear hooks.
  *
  * Two capabilities, both driven by admission stamps ([[stamp]] — a
  * process-wide monotonic counter each memo records at insert):
  *
  *  - '''Delta eviction''' ([[mark]] + [[evictSince]]): drop exactly the
  *    entries admitted after a mark. This is how Bench keeps best-of-2
  *    honest — entries a query's run 1 created are evicted before run 2,
  *    so both timed runs pay the same compute and the min is a COLD
  *    number, while entries that predate the query (genuine cross-query
  *    reuse, e.g. l53 consuming the CC labeling l21 built) survive and
  *    benefit both runs equally.
  *  - '''Reuse accounting''' ([[beginWindow]] + [[preHitCount]]): count
  *    lookup hits on entries stamped at-or-before a window start — i.e.
  *    "this run reused state built before it began". Bench publishes the
  *    per-query delta as `memo_pre` so memo-assisted timings are tagged
  *    in bench_full.json rather than inferred.
  *
  * Registration is once per memo (object-init time); members never
  * unregister — memos are static singletons, not per-session values. */
object SessionMemos {

  trait Member {
    /** Drop — and for frame-backed memos, release — entries admitted
      * strictly after `mark`; return how many were dropped. The caller
      * asserts nothing still holds frames admitted after the mark (see
      * FrameMemo.evictSince for why that matters). */
    def evictSince(mark: Long): Int

    /** Free state held only for handed-out-frame safety (FrameMemo's
      * retired capacity-overflow entries); live lookup-able entries are
      * untouched. The caller asserts QUIESCENCE: no frame previously
      * returned by any memo is still mid-consumption (Harness.drain's
      * between-queries barrier is exactly this point). Default no-op —
      * most memos retain nothing beyond their lookup tables. */
    def releaseRetired(): Int = 0
  }

  private val clock = new java.util.concurrent.atomic.AtomicLong(0L)
  private val members =
    new java.util.concurrent.CopyOnWriteArrayList[Member]()
  private val preHits = new java.util.concurrent.atomic.AtomicLong(0L)
  @volatile private var windowStart = Long.MaxValue

  def register(m: Member): Unit = members.add(m)

  /** Admission stamp for a new memo entry (strictly increasing). */
  def stamp(): Long = clock.incrementAndGet()

  /** Current clock reading: entries stamped after this are "since". */
  def mark(): Long = clock.get()

  /** Evict entries admitted after `mark` from every registered memo. */
  def evictSince(mark: Long): Int = {
    var n = 0
    members.forEach(m => n += m.evictSince(mark))
    n
  }

  /** Release every memo's retired (overflow-held) state — see
    * [[Member.releaseRetired]] for the quiescence contract the caller
    * asserts. Wired into Harness.drain so a harness session's retained
    * storage is bounded by memo capacity, not by how many corpora it
    * cycled. */
  def releaseRetired(): Int = {
    var n = 0
    members.forEach(m => n += m.releaseRetired())
    n
  }

  /** Start counting pre-existing-state hits: lookups that serve an entry
    * stamped at-or-before `mark` increment [[preHitCount]]. */
  def beginWindow(mark: Long): Unit = windowStart = mark

  def preHitCount: Long = preHits.get()

  /** Called by members on every lookup hit with the served entry's
    * admission stamp. Cheap (one volatile read + at most one CAS), so
    * members call it unconditionally; outside a window (windowStart =
    * MaxValue) every hit counts, but nothing reads the counter then. */
  def noteHit(entryStamp: Long): Unit =
    if (entryStamp <= windowStart) preHits.incrementAndGet()
}
