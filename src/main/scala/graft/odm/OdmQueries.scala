package graft.odm

import graft.QueryModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query-registry surface for the ODM domain layer. Inputs come from the
  * shipped XML fixture (not the parquet star schema), so these are
  * no-oracle: golden expectations live in OdmPipelineSpec.
  */
object OdmQueries extends QueryModule {

  /** The reference test fixture batch-cmd id (#uuid "2a302e1b-…-db7831d81e69d",
    * whose 13-hex-digit last group JDK 8 merged into these canonical bits). */
  val BatchCmdId = "2a302e1b-3cb4-425e-bcad-b7831d81e69d"

  /** ODM XML → exploded typed item table (reference R6+R7). doc_pos is
    * serialized to its sortable string form — the harness (and any
    * row-oriented consumer) needs scalar cells, and the padded string
    * preserves the document order the array encodes. */
  def s06(spark: SparkSession, dir: String): DataFrame =
    OdmPipeline.exploded(spark, OdmPipeline.fixturePath()).items
      .withColumn("doc_pos", OdmPipeline.docPosStr(col("doc_pos")))
      .orderBy("item_group_oid", "item_oid")

  /** Full §2.3 command stream (success path), enveloped + level-ordered. */
  def c01(spark: SparkSession, dir: String): DataFrame =
    OdmPipeline.enveloped(spark, OdmPipeline.fixturePath(), BatchCmdId, "importer-1")

  /** Dependency-gated command stream (R15): the event log here acknowledges
    * every command except subject SK01's — its whole subtree must prune
    * (reference semantics: import_clinical_data.clj:130-137). The acked
    * event log derives RELATIONALLY from the envelope stream — a filter on
    * params_json plus column string surgery — so the whole path is one
    * DataFrame chain with no driver materialization; OdmPipelineSpec pins
    * the exact expected set. */
  def c02(spark: SparkSession, dir: String): DataFrame = {
    val env = OdmPipeline.enveloped(spark, OdmPipeline.fixturePath(), BatchCmdId, "importer-1")
    val events = env
      .filter(!col("params_json").contains("SK01"))
      .select(col("id").as("cid"),
        concat(
          regexp_replace(col("name"),
            "^odm-import/(insert-|upsert-|remove-)?", ""),
          lit("/created")).as("name"))
    OdmPipeline.gatedCommands(spark, OdmPipeline.fixturePath(), BatchCmdId,
      "importer-1", events)
  }

  /** R21 error channel as a first-class query: items from the
    * invalid-values fixture split into the success stream and
    * validation-failed events (dead-letter side output). Both branches
    * surface in one frame — at scale each branch is its own sink
    * (quarantine directory vs. command log); the union here is only so
    * the harness sees the whole split. Scalar columns only. */
  def c03(spark: SparkSession, dir: String): DataFrame = {
    val items = OdmPipeline.exploded(spark, OdmPipeline.invalidFixturePath()).items
    val (valid, rejects) = OdmIo.splitValidItems(items)
    valid
      .select(lit("valid").as("branch"), col("item_oid"),
        col("data_type"), col("value_raw"),
        lit(null).cast("string").as("event_id"))
      .unionByName(rejects.select(lit("reject").as("branch"),
        col("item_oid"), col("data_type"), col("value_raw"),
        col("id").as("event_id")))
      .orderBy("branch", "item_oid")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s06_source_xml_odm" -> s06,
    "c01_odm_commands" -> c01,
    "c02_odm_gated" -> c02,
    "c03_odm_quarantine" -> c03)

  val oracles: Map[String, String] = Map.empty
}
