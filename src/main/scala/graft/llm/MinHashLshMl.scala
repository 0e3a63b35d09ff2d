package graft.llm

import graft.{QueryModule, Tables}
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** l02b: MLlib MinHashLSH variant of near-dup detection, behind the same
  * pair-listing interface as the pure-SQL l02 (SURVEY.md §2.2 l02,
  * "MLlib variant no-oracle, property-tested").
  *
  * Pipeline: word-3-shingles → HashingTF (binary sparse sets, 2^16 dims)
  * → MinHashLSH(4 tables, fixed seed) for the banding hashes → same-band
  * candidate join → EXACT Jaccard verify at distance ≤ 0.6.
  *
  * Deliberately NOT `model.approxSimilarityJoin`: that runs an
  * interpreted per-candidate-pair distance UDF over freshly allocated ML
  * sparse vectors — measured as the single slowest query of the whole
  * round-3 bench (84 s driver-side at sf0.1) and pure GC pressure at
  * scale. Instead we take the model's own hash tables
  * (`model.transform`), explode them to (table, hash) bands, equi-join
  * bands (shuffle on the band key — never all-pairs, the same
  * OR-amplified candidate set approxSimilarityJoin builds internally),
  * and verify with codegen'd `array_intersect`/`array_union` set ops
  * over each doc's HashingTF index set. The index sets are reproduced
  * relationally via `pmod(hash(shingle), 2^16)`: Spark SQL `hash()` IS
  * HashingTF's murmur3-seed-42 term hash, so the Jaccard computed here
  * is bit-identical to approxSimilarityJoin's keyDistance.
  */
object MinHashLshMl extends QueryModule {

  private val NumFeatures = 1 << 16
  private val MaxDist = 0.6

  def l02b(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      // <3-word docs yield no shingles (sequence(1, size-2) would be
      // descending and element_at(w, 0) throws) — same guard as l02c/d
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(1, size(w)-2), i -> concat_ws(' ', element_at(w,i), element_at(w,i+1), element_at(w,i+2))))")
        .as("shingles"))
      // HashingTF index set, computed once per doc and reused by the
      // exact-Jaccard verify (cheaper to carry than to re-join shingles)
      .withColumn("idxset", expr(
        s"array_sort(array_distinct(transform(shingles, s -> pmod(hash(s), $NumFeatures))))"))
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(NumFeatures).setBinary(true)
    // scoped cache: fit() makes one pass, transform feeds the band
    // explode, and the verify join consumes idxset on both sides — 4
    // passes without it; released before returning (pair-sized result
    // localCheckpoint-materialized below)
    val featurized = tf.transform(sh).cache()
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(4).setSeed(42L)
    val model = lsh.fit(featurized)
    // (table, minhash) band key per doc: the model's hash output, lifted
    // out of ML vectors once per DOC (not once per candidate pair)
    // same flood posture as l02/l02c: band buckets above the cap never
    // enter the pair join (mass-identical docs are exact dedup's job);
    // the membership count shuffles on the same (t, hv) key as the join
    val bands = Llm.capBuckets(
      model.transform(featurized)
        .select(col("doc_id"), col("idxset"), posexplode(col("hashes")))
        .select(col("doc_id"), col("idxset"), col("pos").as("t"),
          vector_to_array(col("col")).getItem(0).as("hv")),
      Seq("t", "hv"), Llm.BandBucketCap)
    val pairs = bands.as("x").join(bands.as("y"),
        col("x.t") === col("y.t") && col("x.hv") === col("y.hv")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.idxset").as("ia"), col("y.idxset").as("ib"))
      .dropDuplicates("a", "b")
    val out = pairs
      .withColumn("jaccard_dist", round(lit(1.0) -
        size(array_intersect(col("ia"), col("ib"))).cast("double") /
          size(array_union(col("ia"), col("ib"))).cast("double"), 6))
      .filter(col("jaccard_dist") <= MaxDist)
      .select("a", "b", "jaccard_dist")
      .orderBy("a", "b")
      .localCheckpoint()
    featurized.unpersist(blocking = false)
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l02b_dedup_near_ml" -> l02b)

  val oracles: Map[String, String] = Map.empty
}
