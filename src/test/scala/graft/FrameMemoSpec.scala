package graft

import org.apache.spark.sql.functions._

/** The FrameMemo contract beyond the hit/miss pins living in
  * PipelineSpec/DedupSpec: FIFO eviction at capacity releases the
  * evicted frame's checkpoint blocks AND unprotects them (a leak here
  * would pin storage memory for the session — the exact debt class
  * Fixpoint.release exists to prevent), and clear() empties everything
  * it registered. */
class FrameMemoSpec extends SparkSuite {
  import spark.implicits._

  private def checkpointed(tag: Int) =
    Seq((tag.toLong, s"v$tag")).toDF("k", "v").localCheckpoint()

  private def liveRddIds(): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("eviction past capacity releases and unprotects the oldest entry") {
    val memo = new FrameMemo[Int](capacity = 2)
    val before = liveRddIds()
    // three distinct keys (distinct literal plans) -> third insert evicts #1
    val f1 = memo.getOrCompute(spark,
      Seq(1).toDF("a").queryExecution.normalized, 1)(checkpointed(1))
    val f1Ids = Harness.frameRddIds(f1).toSet
    memo.getOrCompute(spark,
      Seq(2).toDF("a").queryExecution.normalized, 2)(checkpointed(2))
    assert(f1Ids.subsetOf(liveRddIds()), "entry 1 must stay live at capacity")
    memo.getOrCompute(spark,
      Seq(3).toDF("a").queryExecution.normalized, 3)(checkpointed(3))
    assert(f1Ids.intersect(liveRddIds()).isEmpty,
      "evicted entry's checkpoint blocks must be unpersisted")
    // the survivors are exactly the two newer frames
    assert((liveRddIds() -- before).size === 2)
    memo.clear()
    assert(liveRddIds() -- before === Set.empty,
      "clear() must release every remaining entry")
    // evicted/cleared ids must no longer be drain-protected: a drain now
    // would unpersist a fresh unmanaged checkpoint with those ids gone
    val stray = checkpointed(9)
    Harness.drain(spark, settleMs = 0L)
    assert(Harness.frameRddIds(stray).toSet.intersect(liveRddIds()).isEmpty,
      "an unmanaged checkpoint must NOT survive drain (stale protection leak)")
  }

  test("params distinguish entries sharing a plan; race-loser frame is released") {
    val memo = new FrameMemo[String](capacity = 4)
    val plan = Seq(42).toDF("a").queryExecution.normalized
    val fa = memo.getOrCompute(spark, plan, "a")(checkpointed(10))
    val fb = memo.getOrCompute(spark, plan, "b")(checkpointed(11))
    assert(!(fa eq fb))
    assert(memo.getOrCompute(spark, plan, "a")(
      fail("must not recompute on a params hit")) eq fa)
    memo.clear()
  }
}
