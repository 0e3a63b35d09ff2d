package graft.llm

import graft.{QueryModule, Tables}
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** l02b: MLlib MinHashLSH variant of near-dup detection, behind the same
  * pair-listing interface as the pure-SQL l02 (SURVEY.md §2.2 l02,
  * "MLlib variant no-oracle, property-tested").
  *
  * Pipeline: word-3-shingles → HashingTF (binary sparse sets, 2^18 dims)
  * → MinHashLSH(4 tables, fixed seed) → approxSimilarityJoin on Jaccard
  * distance. approxSimilarityJoin explodes each doc to its hash buckets
  * and joins bucket-to-bucket — the same linear LSH shape as l02, executed
  * by MLlib's implementation.
  */
object MinHashLshMl extends QueryModule {

  def l02b(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(1, size(w)-2), i -> concat_ws(' ', element_at(w,i), element_at(w,i+1), element_at(w,i+2))))")
        .as("shingles"))
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(1 << 16).setBinary(true)
    // cached: the self approxSimilarityJoin consumes it as BOTH sides, and
    // fit() makes a third pass — without cache the shingle explode runs 3×
    val featurized = tf.transform(sh).cache()
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(4).setSeed(42L)
    val model = lsh.fit(featurized)
    model.approxSimilarityJoin(featurized, featurized, 0.6, "jaccard_dist")
      .select(
        col("datasetA.doc_id").as("a"),
        col("datasetB.doc_id").as("b"),
        round(col("jaccard_dist"), 6).as("jaccard_dist"))
      .filter(col("a") < col("b"))
      .orderBy("a", "b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l02b_dedup_near_ml" -> l02b)

  val oracles: Map[String, String] = Map.empty
}
