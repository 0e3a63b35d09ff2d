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
  * Eviction (FIFO past `capacity`) and [[clear]] unprotect AND release
  * the blocks.
  *
  * Staleness is the caller's contract, as with l43's trainMemo: a corpus
  * regenerated IN PLACE still sameResult-matches a re-read of the same
  * path (PipelineSpec pins this empirically), so pipelines that rewrite
  * inputs call [[clear]] between generations. */
final class FrameMemo[P](capacity: Int = 8) {

  private val entries =
    new java.util.ArrayDeque[(SparkSession, LogicalPlan, P, DataFrame)]()

  private def lookup(spark: SparkSession, key: LogicalPlan, params: P)
      : Option[DataFrame] = {
    val it = entries.iterator()
    var found: Option[DataFrame] = None
    while (it.hasNext && found.isEmpty) {
      val (s, p, pr, df) = it.next()
      if ((s eq spark) && pr == params && p.sameResult(key)) found = Some(df)
    }
    found
  }

  /** Serve the memoized frame for (spark, key, params) or run `compute`
    * — which must return an eagerly-materialized (localCheckpoint'd)
    * frame — and store it. On a lost race the freshly computed frame is
    * released and the winner served, so exactly one copy stays live. */
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
            entries.addLast((spark, key, params, computed))
            Harness.protectRdds(Harness.frameRddIds(computed))
            if (entries.size > capacity) evict(entries.removeFirst()._4)
            computed
        }
      }
    }

  private def evict(df: DataFrame): Unit = {
    Harness.unprotectRdds(Harness.frameRddIds(df))
    Fixpoint.release(df)
  }

  /** Drop every entry, unprotecting and releasing its blocks. */
  def clear(): Unit = entries.synchronized {
    while (!entries.isEmpty) evict(entries.removeFirst()._4)
  }
}
