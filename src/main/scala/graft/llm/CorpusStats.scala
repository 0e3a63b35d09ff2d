package graft.llm

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Session-scoped memo for the corpus-size probes that right-size the
  * scaled dedup parameters (scaledSimBandBits / scaledPlanes / scaledK).
  *
  * Each probe is one tiny count() job, but a library caller composing
  * several dedup stages over the SAME input frame (l02c + l02d + l02e in
  * one curation pass is the normal shape) would otherwise rescan the
  * corpus once per stage. Keyed by the NORMALIZED logical plan — the
  * same key Spark's own plan cache uses — so the same source frame hits
  * the memo regardless of which stage built the DataFrame object, while
  * different inputs (other SF dirs, filtered frames) miss it.
  *
  * The memo deliberately trades freshness for scan count: parameter
  * derivation tolerates a stale n (band width moves by whole bits per
  * ~2× corpus growth), so re-reading a mutated path mid-session is not a
  * correctness concern. Entries are a (plan, Long) pair per distinct
  * input frame — bounded by the handful of corpora a session touches.
  */
object CorpusStats {
  // sameResult (what CacheManager itself uses for cache lookups), not
  // plan equality: two spark.read.parquet(path) calls build distinct
  // relation objects that only semantic comparison identifies. Entries
  // are bounded (FIFO-evicted past MaxEntries) so a long-lived session
  // probing many distinct frames can't accumulate retained plan graphs,
  // and the linear sameResult scan stays cheap.
  private val MaxEntries = 64
  // (plan, count, admission stamp) — stamped so SessionMemos can delta-
  // evict and attribute cross-query reuse like every other session memo
  private val memo = new java.util.ArrayDeque[(LogicalPlan, Long, Long)]()
  graft.SessionMemos.register(new graft.SessionMemos.Member {
    override def evictSince(mark: Long): Int = memo.synchronized {
      var n = 0
      while (!memo.isEmpty && memo.peekLast()._3 > mark) {
        memo.removeLast(); n += 1
      }
      n
    }
  })

  /** df.count(), memoized per semantically-equal normalized plan. */
  def n(df: DataFrame): Long = {
    val key = df.queryExecution.normalized
    memo.synchronized {
      val it = memo.iterator()
      while (it.hasNext) {
        val (p, v, stamp) = it.next()
        if (p.sameResult(key)) {
          graft.SessionMemos.noteHit(stamp)
          return v
        }
      }
    }
    val v = df.count() // outside the lock: a count can take seconds
    memo.synchronized {
      if (!memo.iterator().asScala.exists(_._1.sameResult(key))) {
        memo.addLast((key, v, graft.SessionMemos.stamp()))
        if (memo.size > MaxEntries) memo.removeFirst()
      }
    }
    v
  }

  /** Drop all memoized sizes — the invalidation hook for callers whose
    * corpus mutates beyond the parameter-derivation tolerance. */
  def clear(): Unit = memo.synchronized(memo.clear())
}
