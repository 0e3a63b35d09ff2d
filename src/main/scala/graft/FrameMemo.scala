package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Session-scoped memo of localCheckpoint-MATERIALIZED frames — the
  * "compute once per corpus, reuse across operators" contract shared by
  * the CC labeling (Pipeline.dedupClusterLabels) and the MinHash pair
  * graph (Llm.minHashNearDupPairs), the two multi-job artifacts several
  * registered queries re-derive from one input.
  *
  * Keying: (SparkSession identity, canonicalized input plan, a params
  * value). The input plan MUST be the raw source read — memoized frames
  * are themselves LogicalRDDs, and any eagerly-checkpointed intermediate
  * in the key would make every construction a fresh never-matching plan
  * (the round-9 ccMemo lesson).
  *
  * Stored frames' RDD ids are registered with [[Harness.protectRdds]] so
  * the inter-query drain (Bench/Verify) doesn't unpersist them — a memo
  * hit on a drained frame would be an unrecomputable LocalCheckpointRDD.
  *
  * '''Returned-frame validity''': a frame returned by [[getOrCompute]]
  * stays valid until [[clear]] or an [[evictSince]] whose mark precedes
  * its admission — both release its blocks, and a LocalCheckpointRDD
  * cannot recompute them. Capacity overflow deliberately does NOT
  * release: the overflowed entry leaves the lookup table (so it can't be
  * served again) but its blocks are RETIRED — retained and still
  * drain-protected — until the next clear()/covering evictSince, so a
  * caller still holding the handed-out frame is never invalidated
  * underneath. Overflow is logged loudly: with per-(corpus, params) keys
  * it means >capacity live corpora in one session, which is almost
  * always a missing clear() between corpus generations.
  *
  * Staleness is the caller's contract, as with l43's trainMemo: a corpus
  * regenerated IN PLACE still sameResult-matches a re-read of the same
  * path (PipelineSpec pins this empirically), so pipelines that rewrite
  * inputs call [[clear]] between generations. */
final class FrameMemo[P](capacity: Int = 8) extends SessionMemos.Member {

  SessionMemos.register(this)

  // admission-ordered (ArrayDeque insert order == stamp order)
  private val entries =
    new java.util.ArrayDeque[(SparkSession, LogicalPlan, P, DataFrame, Long)]()
  // overflow-evicted frames: invisible to lookup, blocks retained (and
  // still drain-protected) until clear()/evictSince — see class doc
  private val retired = new java.util.ArrayDeque[(DataFrame, Long)]()

  private def lookup(spark: SparkSession, key: LogicalPlan, params: P)
      : Option[DataFrame] = {
    val it = entries.iterator()
    var found: Option[DataFrame] = None
    while (it.hasNext && found.isEmpty) {
      val (s, p, pr, df, stamp) = it.next()
      if ((s eq spark) && pr == params && p.sameResult(key)) {
        SessionMemos.noteHit(stamp)
        found = Some(df)
      }
    }
    found
  }

  /** Serve the memoized frame for (spark, key, params) or run `compute`
    * — which must return an eagerly-materialized (localCheckpoint'd)
    * frame — and store it. On a lost race the freshly computed frame is
    * released and the winner served, so exactly one copy stays live.
    * Returned frames stay valid per the class-doc validity contract. */
  def getOrCompute(spark: SparkSession, key: LogicalPlan, params: P)
      (compute: => DataFrame): DataFrame =
    entries.synchronized(lookup(spark, key, params)).getOrElse {
      val computed = compute
      entries.synchronized {
        lookup(spark, key, params) match {
          case Some(winner) =>
            Fixpoint.release(computed)
            winner
          case None =>
            entries.addLast((spark, key, params, computed, SessionMemos.stamp()))
            Harness.protectRdds(spark.sparkContext, Harness.frameRddIds(computed))
            if (entries.size > capacity) {
              val ev = entries.removeFirst()
              retired.addLast((ev._4, ev._5))
              System.err.println(s"[FrameMemo] capacity $capacity overflow: " +
                "retiring oldest entry (blocks held until clear/evictSince; " +
                "a session cycling corpora should clear() between generations)")
            }
            computed
        }
      }
    }

  private def release(df: DataFrame): Unit = {
    Harness.unprotectRdds(df.sparkSession.sparkContext, Harness.frameRddIds(df))
    Fixpoint.release(df)
  }

  /** Drop AND RELEASE entries (live and retired) admitted after `mark`.
    * Caller asserts nothing still holds a frame admitted after the mark
    * — in Bench's between-runs reset, run 1's frame was fully consumed
    * by its sink write before the evict. */
  override def evictSince(mark: Long): Int = entries.synchronized {
    var n = 0
    while (!entries.isEmpty && entries.peekLast()._5 > mark) {
      release(entries.removeLast()._4); n += 1
    }
    while (!retired.isEmpty && retired.peekLast()._2 > mark) {
      release(retired.removeLast()._1); n += 1
    }
    n
  }

  /** Drop every entry — live and retired — unprotecting and releasing
    * its blocks. After this, previously returned frames are INVALID. */
  def clear(): Unit = entries.synchronized {
    while (!entries.isEmpty) release(entries.removeFirst()._4)
    while (!retired.isEmpty) release(retired.removeFirst()._1)
  }
}
