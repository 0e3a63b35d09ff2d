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
  * stays valid until [[clear]], an [[evictSince]] whose mark precedes
  * its admission, or a [[releaseRetired]] after the entry was
  * capacity-retired — all release its blocks, and a LocalCheckpointRDD
  * cannot recompute them. Capacity overflow deliberately does NOT
  * release inline: the overflowed entry leaves the lookup table (so it
  * can't be served again) but its blocks are RETIRED — retained and
  * still drain-protected — so a caller still holding the handed-out
  * frame is never invalidated mid-consumption. Retired blocks are freed
  * at the next QUIESCENCE BARRIER ([[releaseRetired]], wired through
  * SessionMemos into Harness.drain's between-queries point — where the
  * caller asserts no handed-out frame is still being consumed; drain
  * already unpersists every unprotected RDD there, so any plan still
  * mid-flight would break regardless) or by clear()/covering
  * evictSince, whichever comes first — bounding retained storage in a
  * long session without a refcount API on every call site. Overflow is
  * logged loudly, and past [[FrameMemo.MaxRetired]] un-released retired
  * entries it THROWS: with per-(corpus, params) keys that means dozens
  * of live corpora with neither a drain nor a clear() between
  * generations — the pinned-storage failure mode the drain exists to
  * prevent, surfaced as an error naming the fix instead of as an
  * eventual executor OOM.
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
            // hard-cap check BEFORE admission: throwing after addLast +
            // protectRdds would leave one more never-evictable protected
            // entry per caught-and-retried call — the exact pinned-storage
            // growth the cap exists to stop. The fresh frame is released
            // (the caller gets the exception, not the frame).
            if (entries.size >= capacity &&
                retired.size >= FrameMemo.MaxRetired) {
              Fixpoint.release(computed)
              throw new IllegalStateException(
                s"FrameMemo holds ${retired.size} retired frames' blocks " +
                  "(capacity overflows with no intervening quiescence) — " +
                  "call clear() between corpus generations, or drain " +
                  "(Harness.drain / SessionMemos.releaseRetired) at a " +
                  "point where no handed-out frame is mid-consumption")
            }
            entries.addLast((spark, key, params, computed, SessionMemos.stamp()))
            Harness.protectRdds(spark.sparkContext, Harness.frameRddIds(computed))
            if (entries.size > capacity) {
              val ev = entries.removeFirst()
              retired.addLast((ev._4, ev._5))
              System.err.println(s"[FrameMemo] capacity $capacity overflow: " +
                "retiring oldest entry (blocks held until the next drain/" +
                "clear/evictSince; a session cycling corpora should clear() " +
                "between generations)")
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

  /** Free all retired (capacity-overflow) entries' blocks. Caller
    * asserts quiescence — no handed-out frame is mid-consumption (see
    * the class doc); live entries are untouched and stay served. */
  override def releaseRetired(): Int = entries.synchronized {
    var n = 0
    while (!retired.isEmpty) { release(retired.removeFirst()._1); n += 1 }
    n
  }

  /** Drop every entry — live and retired — unprotecting and releasing
    * its blocks. After this, previously returned frames are INVALID. */
  def clear(): Unit = entries.synchronized {
    while (!entries.isEmpty) release(entries.removeFirst()._4)
    while (!retired.isEmpty) release(retired.removeFirst()._1)
  }
}

object FrameMemo {
  /** Un-released retired entries tolerated before overflow THROWS —
    * high enough that any session with a working drain/clear discipline
    * never sees it, low enough that the pinned-storage growth fails fast
    * instead of OOMing an executor hours later. */
  private[graft] val MaxRetired = 64
}
