package graft

import org.apache.spark.sql.functions._

/** l03b (multi-probe LSH ANN) quality: candidates are a strict subset of
  * the corpus, and recall@10 against the exact scan (l03) is meaningful. */
class AnnSpec extends SparkSuite {

  test("ANN prunes the corpus and keeps useful recall vs exact top-10") {
    val exact = llm.Llm.l03(spark, sf).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val ann = llm.Llm.l03b(spark, sf).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(ann.size <= 10)
    val recall = exact.intersect(ann).size
    info(s"recall@10 = $recall/10")
    assert(recall >= 3, s"multi-probe recall collapsed: $recall/10")
    // pruning is real: the probed region is well under the full corpus
    val total = Tables.embeddings(spark, sf).count()
    val probed = llm.Llm.l03bProbedCount(spark, sf)
    info(s"probed $probed of $total vectors")
    assert(probed < total * 2 / 3)
  }
}
