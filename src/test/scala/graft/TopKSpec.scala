package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom TopKPerGroup operator (logical node + strategy + two-phase
  * physical exec): exact equivalence to the window idiom, plan shape, and
  * edge cases. */
class TopKSpec extends SparkSuite {

  test("o08: weighted sample matches a driver-side A-Res replay and skews long") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def key(id: Long, w: Long): Double =
      math.log(java.lang.Long.parseLong(md5Hex(s"ws:$id").take(15), 16)
        / 1152921504606846976.0) / w
    val expected = docs.sortBy { case (id, w) => (-key(id, w), id) }
      .take(50).map(_._1).sorted.toSeq
    val got = operators.Windows.o08(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(got === expected)
    // weighting must bite: sampled docs are longer than average
    val sampled = docs.filter(d => got.contains(d._1)).map(_._2.toDouble)
    val all = docs.map(_._2.toDouble)
    assert(sampled.sum / sampled.length > all.sum / all.length,
      "length-weighted sample should over-represent long documents")
  }

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  private def customTopK(k: Int) =
    plans.TopK.topKPerGroup(
      Tables.orders(spark, sf).select("o_custkey", "o_orderkey", "o_totalprice"),
      Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)), k)

  test("custom top-k returns exactly the window idiom's rows (k=3)") {
    val a = customTopK(3)
    val b = windowTopK(3)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    assert(a.count() == b.count())
  }

  test("k larger than every group passes all rows through") {
    val n = Tables.orders(spark, sf).count()
    assert(customTopK(1000000).count() == n)
  }

  test("k=1 equals latest-wins max_by semantics") {
    val a = customTopK(1)
    val b = windowTopK(1)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("plan: partial+final heap phases with exactly one exchange between them") {
    val plan = customTopK(3).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupPartial"), s"missing partial phase:\n$plan")
    assert(plan.contains("TopKPerGroupFinal"), s"missing final phase:\n$plan")
    // EnsureRequirements must have inserted a hash exchange on the group key
    assert(plan.contains("Exchange hashpartitioning(o_custkey"),
      s"missing group-key exchange:\n$plan")
    // and the plan must NOT sort anything — that's the whole point
    assert(!plan.contains("Sort "), s"unexpected sort in top-k plan:\n$plan")
  }

  test("TopKRewrite: window row_number<=k with rn pruned optimizes to the heap operator") {
    val windowForm = windowTopK(3) // .drop("rn") already — rn is pruned above the filter
    val before = windowForm.queryExecution.optimizedPlan
    assert(before.collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }.nonEmpty,
      "sanity: un-extended session keeps the window")

    val exp = spark.experimental
    exp.extraOptimizations = exp.extraOptimizations :+ plans.TopKRewrite
    if (!exp.extraStrategies.contains(plans.TopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ plans.TopKStrategy
    try {
      val after = windowTopK(3)
      val opt = after.queryExecution.optimizedPlan
      assert(opt.collect { case t: plans.TopKPerGroup => t }.nonEmpty,
        s"rewrite did not fire:\n$opt")
      assert(opt.collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }.isEmpty,
        s"window survived:\n$opt")
      val phys = after.queryExecution.executedPlan.toString
      assert(phys.contains("TopKPerGroupPartial") && phys.contains("TopKPerGroupFinal"))
      // identical rows to the unrewritten form
      val a = after.collect().map(_.toString).sorted.toSeq
      exp.extraOptimizations = exp.extraOptimizations.filterNot(_ == plans.TopKRewrite)
      val b = windowTopK(3).collect().map(_.toString).sorted.toSeq
      assert(a === b)
    } finally {
      exp.extraOptimizations = exp.extraOptimizations.filterNot(_ == plans.TopKRewrite)
    }
  }

  test("TopKRewrite does NOT fire when the rank column is still referenced") {
    val exp = spark.experimental
    exp.extraOptimizations = exp.extraOptimizations :+ plans.TopKRewrite
    try {
      // o03 keeps rn in its output — must stay a window plan
      val opt = operators.Windows.o03(spark, sf).queryExecution.optimizedPlan
      assert(opt.collect { case t: plans.TopKPerGroup => t }.isEmpty,
        s"rewrite fired on a plan that needs rn:\n$opt")
    } finally {
      exp.extraOptimizations = exp.extraOptimizations.filterNot(_ == plans.TopKRewrite)
    }
  }

  test("multi-column groups and mixed sort directions") {
    val base = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber", "l_quantity")
    val a = plans.TopK.topKPerGroup(base, Seq("l_returnflag", "l_linestatus"),
      Seq(("l_quantity", true), ("l_orderkey", false), ("l_linenumber", false)), 5)
    val w = Window.partitionBy("l_returnflag", "l_linestatus")
      .orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))
    val b = base.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5).drop("rn")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}
