package graft.odm

import graft.QueryModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query-registry surface for the ODM domain layer. Inputs come from the
  * shipped XML fixture (not the parquet star schema); all five queries
  * (s06/c01/c02/c03/c04) are gated by golden-table oracles (see `oracles`
  * below) plus the OdmPipelineSpec/OdmIoSpec/BrokerWireSpec goldens.
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
    * the harness sees the whole split. Rejects carry the broker's
    * retryable-vs-fatal requeue split (broker.clj:88-95 — see
    * splitValidItems): coercion = fatal, missing-parent = retryable.
    * Scalar columns only. */
  def c03(spark: SparkSession, dir: String): DataFrame = {
    val items = OdmPipeline.exploded(spark, OdmPipeline.invalidFixturePath()).items
    val (valid, rejects) = OdmIo.splitValidItems(items)
    valid
      .select(lit("valid").as("branch"), col("item_oid"),
        col("data_type"), col("value_raw"),
        lit(null).cast("string").as("event_id"),
        lit(null).cast("boolean").as("requeue"),
        lit(null).cast("string").as("reason"))
      .unionByName(rejects.select(lit("reject").as("branch"),
        col("item_oid"), col("data_type"), col("value_raw"),
        col("id").as("event_id"), col("requeue"), col("reason")))
      .orderBy("branch", "item_oid")
  }

  /** Wire-level broker loop (reference broker.clj:65-95 delivery-fn): the
    * c01 command stream serialized to bus-shaped records
    * (BrokerWire.encode) plus five poison deliveries, pushed through the
    * consumer-side classifier (BrokerWire.decode) — valid commands ack and
    * decode back to exactly the c01 envelope; unreadable payloads are
    * log-only (neither acked nor rejected, broker.clj:68-75); readable but
    * Command-schema-invalid deliveries reject without requeue
    * (broker.clj:76-82). Map-only over the record stream — the decode plan
    * is identical over a real Kafka source (BrokerWireSpec runs it over a
    * file-backed stream). */
  def c04(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wire = graft.streaming.BrokerWire.encode(
      OdmPipeline.envelopedUnordered(spark, OdmPipeline.fixturePath(),
        BatchCmdId, "importer-1"),
      "lens-sds.batch-commands")
    val poison = Seq(
        "garbage-not-transit", // read-transit throw: not a payload at all
        "{\"id\":\"tr", // truncated mid-write
        "42", // readable scalar — reaches and fails the SCHEMA check
        """{"id":"not-a-uuid","name":"odm-import/insert-subject","sub":"importer-1"}""",
        """{"id":"7f1d3a5e-0000-5000-8000-000000000001","name":"odm-import/upsert-study-event","sub":"   "}""")
      .toDF("p")
      .select(lit(null).cast("binary").as("key"),
        col("p").cast("binary").as("value"),
        lit("lens-sds.batch-commands").as("topic"), lit(0).as("partition"))
    graft.streaming.BrokerWire.decode(wire.unionByName(poison))
      .select("branch", "disposition", "requeue", "reason", "payload",
        "id", "name", "sub", "file_oid", "params_json", "level", "doc_pos")
      .orderBy(col("branch"), coalesce(col("payload"), lit("")),
        coalesce(col("level"), lit(-1)), coalesce(col("name"), lit("")),
        coalesce(col("params_json"), lit("")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s06_source_xml_odm" -> s06,
    "c01_odm_commands" -> c01,
    "c02_odm_gated" -> c02,
    "c03_odm_quarantine" -> c03,
    "c04_broker_decode" -> c04)

  /** Round-8 upgrade from no-oracle: the ODM fixture is shipped in-repo
    * and scale-factor-INDEPENDENT, so the expected command stream is a
    * constant — these oracles are GOLDEN TABLES (VALUES lists) in the
    * exact order the engine emits. The goldens are not self-referential:
    * every UUID chain is pinned by OdmPipelineSpec/OdmPropertySpec
    * against expectations transliterated from the reference's own tests
    * (test/lens/import_clinical_data_test.clj:10-280, incl. the golden
    * gen-cmd-id at :263-267); the driver hash-gate now re-confirms the
    * whole stream every round. s06's raw-TIMESTAMP value_datetime was the
    * r8 blocker for a golden; the gate normalizes both engines' timestamps
    * to datetime64[us] and five oracled queries (a01, s01, s03, s19, s20)
    * already ride that path, so s06 gets the same VALUES golden as the
    * c-queries (transliterated from the engine's pinned output over the
    * in-repo fixture, itself pinned by OdmPipelineSpec against the
    * reference's own test expectations). */
  val oracles: Map[String, String] = Map(
    "s06_source_xml_odm" ->
      """SELECT * FROM (VALUES
        |  ('FILE-1', '000000.000000.000000.000000.000000.000000', 'IG1', 'f891510b-a636-5657-9d4b-95bb5c9576d6', 'I1', '1f9a686e-bcfa-5bd9-b3e9-9e96e6215897', 'insert', 'string', 'x', 'x', CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS TIMESTAMP)),
        |  ('FILE-1', '000000.000000.000000.000000.000000.000001', 'IG1', 'f891510b-a636-5657-9d4b-95bb5c9576d6', 'I2', 'bd0509b7-38d5-502d-8b63-fe8cfca6847e', 'insert', 'integer', '42', CAST(NULL AS VARCHAR), CAST(42 AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS TIMESTAMP)),
        |  ('FILE-1', '000000.000000.000000.000000.000000.000002', 'IG1', 'f891510b-a636-5657-9d4b-95bb5c9576d6', 'I3', 'bf3972e5-3477-53cf-85db-5a609c6e3928', 'insert', 'float', '3.25', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(3.25 AS DOUBLE), CAST(NULL AS TIMESTAMP)),
        |  ('FILE-1', '000000.000000.000000.000000.000000.000003', 'IG1', 'f891510b-a636-5657-9d4b-95bb5c9576d6', 'I4', '807ce840-fbec-5524-91a4-d837e5380300', 'insert', 'datetime', '2016-03-18T14:41:00Z', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), TIMESTAMP '2016-03-18 14:41:00'),
        |  ('FILE-1', '000000.000001.000000.000000.000000.000000', 'IG2', 'c9097569-8f6e-5919-9061-5db0a477047d', 'I5', '6930b0b9-b0cc-52bb-8636-633de695f6c2', 'insert', 'string', 'y', 'y', CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS TIMESTAMP)),
        |  ('FILE-1', '000000.000003.000000.000000.000000.000000', 'IG4', 'de3c8b8e-3091-5f85-8cf0-705655df9853', 'I7', 'e50cf695-72fc-548c-a89e-5aab30ae2feb', 'insert', 'integer', '7', CAST(NULL AS VARCHAR), CAST(7 AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS TIMESTAMP)),
        |  ('FILE-1', '000000.000003.000001.000000.000000.000000', 'IG5', 'ff2488a3-c6b8-59bd-b285-573153b57eca', 'I8', '16bc392c-1f09-54a8-b1eb-505ff54786cc', 'remove', 'string', 'w', 'w', CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS TIMESTAMP)),
        |  ('FILE-1', '000000.000003.000001.000000.000000.000001', 'IG5', 'ff2488a3-c6b8-59bd-b285-573153b57eca', 'I9', 'aa9cedff-eaff-5f00-af87-828ea2609ef8', 'update', 'float', '1.5', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(1.5 AS DOUBLE), CAST(NULL AS TIMESTAMP))
        |) t(file_oid, doc_pos, item_group_oid, item_group_id, item_oid, item_id, tx, data_type, value_raw, value_string, value_integer, value_float, value_datetime)
        |ORDER BY item_group_oid, item_oid""".stripMargin,
    "c01_odm_commands" ->
      """SELECT * FROM (VALUES
        |  ('baf08666-b9fb-5f9f-a100-2af10593f726', 'odm-import/insert-subject', 'importer-1', 'FILE-1', '{"study_id":"e0613ddc-8747-503d-8c70-2a4d9589ff08","subject_key":"SK01"}', 1, '000000.000000'),
        |  ('8ecc7786-c77b-5653-9bb6-a61e587bbe96', 'odm-import/remove-subject', 'importer-1', 'FILE-1', '{"study_id":"e0613ddc-8747-503d-8c70-2a4d9589ff08","subject_key":"SK03"}', 1, '000000.000002'),
        |  ('ff40841d-71e4-5c02-b1ca-5831199f94a1', 'odm-import/upsert-subject', 'importer-1', 'FILE-1', '{"study_id":"e0613ddc-8747-503d-8c70-2a4d9589ff08","subject_key":"SK02"}', 1, '000000.000001'),
        |  ('cb1345f7-9fdf-560d-9773-a4eb83331759', 'odm-import/insert-study-event', 'importer-1', 'FILE-1', '{"subject_id":"a25f047f-a387-54ce-8096-891157b6381e","study_event_oid":"SE01"}', 2, '000000.000000.000000'),
        |  ('f2c29ccd-697d-5f8f-bf74-d18f19bf3796', 'odm-import/insert-study-event', 'importer-1', 'FILE-1', '{"subject_id":"a287c159-932c-5938-9727-af3b639297ad","study_event_oid":"SE04"}', 2, '000000.000003.000000'),
        |  ('3239ba99-a23c-5957-8573-d7989ccd8fd3', 'odm-import/upsert-study-event', 'importer-1', 'FILE-1', '{"subject_id":"00fcdbee-9db0-5540-9f5a-7b6c252e8cc9","study_event_oid":"SE02"}', 2, '000000.000001.000000'),
        |  ('cff1cf1f-01f8-5d7a-a64f-f2e394d668e3', 'odm-import/insert-form', 'importer-1', 'FILE-1', '{"study_event_id":"58bab24f-d44a-585c-8b40-a59aadeac43a","form_oid":"FM2"}', 3, '000000.000001.000000.000000'),
        |  ('2081d530-e18b-5b92-ab04-550d99f785a5', 'odm-import/insert-form', 'importer-1', 'FILE-1', '{"study_event_id":"dd951c5a-34d1-514b-a2e5-3a5f0f689ba4","form_oid":"FM4"}', 3, '000000.000003.000000.000000'),
        |  ('9ba7558e-7fc1-5c8e-b21a-da1b263e5d7a', 'odm-import/insert-form', 'importer-1', 'FILE-1', '{"study_event_id":"e0dcd145-7051-598a-8899-3797b3dad28c","form_oid":"FM1"}', 3, '000000.000000.000000.000000'),
        |  ('77075f0e-96ab-55f9-a440-ba35feba25d4', 'odm-import/insert-item-group', 'importer-1', 'FILE-1', '{"form_id":"270da087-987f-55f1-b315-4a674444ef6c","item_group_oid":"IG4"}', 4, '000000.000003.000000.000000.000000'),
        |  ('bdd41418-da5a-51b9-94ed-f4bcb8d86542', 'odm-import/insert-item-group', 'importer-1', 'FILE-1', '{"form_id":"31981082-9bcd-5d10-b243-5934033831ee","item_group_oid":"IG1"}', 4, '000000.000000.000000.000000.000000'),
        |  ('27da9dfe-bf3b-5881-87e7-0a15a1e473dd', 'odm-import/insert-item-group', 'importer-1', 'FILE-1', '{"form_id":"d1a58fd1-317e-5828-88d2-7e8e036b0095","item_group_oid":"IG2"}', 4, '000000.000001.000000.000000.000000'),
        |  ('33638d9d-b05e-5b0c-b32c-93fe6ea2b3b9', 'odm-import/insert-item', 'importer-1', 'FILE-1', '{"item_group_id":"c9097569-8f6e-5919-9061-5db0a477047d","item_oid":"I5","data_type":"string","value_string":"y"}', 5, '000000.000001.000000.000000.000000.000000'),
        |  ('c7c957aa-6164-5958-80cb-00724b5dcafe', 'odm-import/insert-item', 'importer-1', 'FILE-1', '{"item_group_id":"de3c8b8e-3091-5f85-8cf0-705655df9853","item_oid":"I7","data_type":"integer","value_integer":7}', 5, '000000.000003.000000.000000.000000.000000'),
        |  ('a9115ed5-dabe-5648-88fb-a9d77b8a38cc', 'odm-import/insert-item', 'importer-1', 'FILE-1', '{"item_group_id":"f891510b-a636-5657-9d4b-95bb5c9576d6","item_oid":"I1","data_type":"string","value_string":"x"}', 5, '000000.000000.000000.000000.000000.000000'),
        |  ('6299efe1-f496-5c9d-8aa6-8b66c2d915bd', 'odm-import/insert-item', 'importer-1', 'FILE-1', '{"item_group_id":"f891510b-a636-5657-9d4b-95bb5c9576d6","item_oid":"I2","data_type":"integer","value_integer":42}', 5, '000000.000000.000000.000000.000000.000001'),
        |  ('f04cd29f-1135-5f30-b016-079ae9161ef3', 'odm-import/insert-item', 'importer-1', 'FILE-1', '{"item_group_id":"f891510b-a636-5657-9d4b-95bb5c9576d6","item_oid":"I3","data_type":"float","value_float":3.25}', 5, '000000.000000.000000.000000.000000.000002'),
        |  ('4222618d-7f6f-5d12-9220-4fd2f930b50e', 'odm-import/insert-item', 'importer-1', 'FILE-1', '{"item_group_id":"f891510b-a636-5657-9d4b-95bb5c9576d6","item_oid":"I4","data_type":"datetime","value_datetime":"2016-03-18T14:41:00.000Z"}', 5, '000000.000000.000000.000000.000000.000003'),
        |  ('4d15f4cd-a66e-5956-9cab-c4ab1afc2651', 'odm-import/remove-item', 'importer-1', 'FILE-1', '{"item_group_id":"ff2488a3-c6b8-59bd-b285-573153b57eca","item_oid":"I8"}', 5, '000000.000003.000001.000000.000000.000000'),
        |  ('a065c220-4453-54a8-8f6c-6660640c17e2', 'odm-import/update-item', 'importer-1', 'FILE-1', '{"item_id":"aa9cedff-eaff-5f00-af87-828ea2609ef8","data_type":"float","value_float":1.5}', 5, '000000.000003.000001.000000.000000.000001')
        |) t(id, name, sub, file_oid, params_json, level, doc_pos)
        |ORDER BY level, name, params_json""".stripMargin,
    "c02_odm_gated" ->
      """SELECT * FROM (VALUES
        |  ('baf08666-b9fb-5f9f-a100-2af10593f726', 'odm-import/insert-subject', 'importer-1', 'FILE-1', '{"study_id":"e0613ddc-8747-503d-8c70-2a4d9589ff08","subject_key":"SK01"}', 1, '000000.000000'),
        |  ('8ecc7786-c77b-5653-9bb6-a61e587bbe96', 'odm-import/remove-subject', 'importer-1', 'FILE-1', '{"study_id":"e0613ddc-8747-503d-8c70-2a4d9589ff08","subject_key":"SK03"}', 1, '000000.000002'),
        |  ('ff40841d-71e4-5c02-b1ca-5831199f94a1', 'odm-import/upsert-subject', 'importer-1', 'FILE-1', '{"study_id":"e0613ddc-8747-503d-8c70-2a4d9589ff08","subject_key":"SK02"}', 1, '000000.000001'),
        |  ('f2c29ccd-697d-5f8f-bf74-d18f19bf3796', 'odm-import/insert-study-event', 'importer-1', 'FILE-1', '{"subject_id":"a287c159-932c-5938-9727-af3b639297ad","study_event_oid":"SE04"}', 2, '000000.000003.000000'),
        |  ('3239ba99-a23c-5957-8573-d7989ccd8fd3', 'odm-import/upsert-study-event', 'importer-1', 'FILE-1', '{"subject_id":"00fcdbee-9db0-5540-9f5a-7b6c252e8cc9","study_event_oid":"SE02"}', 2, '000000.000001.000000'),
        |  ('cff1cf1f-01f8-5d7a-a64f-f2e394d668e3', 'odm-import/insert-form', 'importer-1', 'FILE-1', '{"study_event_id":"58bab24f-d44a-585c-8b40-a59aadeac43a","form_oid":"FM2"}', 3, '000000.000001.000000.000000'),
        |  ('2081d530-e18b-5b92-ab04-550d99f785a5', 'odm-import/insert-form', 'importer-1', 'FILE-1', '{"study_event_id":"dd951c5a-34d1-514b-a2e5-3a5f0f689ba4","form_oid":"FM4"}', 3, '000000.000003.000000.000000'),
        |  ('77075f0e-96ab-55f9-a440-ba35feba25d4', 'odm-import/insert-item-group', 'importer-1', 'FILE-1', '{"form_id":"270da087-987f-55f1-b315-4a674444ef6c","item_group_oid":"IG4"}', 4, '000000.000003.000000.000000.000000'),
        |  ('27da9dfe-bf3b-5881-87e7-0a15a1e473dd', 'odm-import/insert-item-group', 'importer-1', 'FILE-1', '{"form_id":"d1a58fd1-317e-5828-88d2-7e8e036b0095","item_group_oid":"IG2"}', 4, '000000.000001.000000.000000.000000'),
        |  ('33638d9d-b05e-5b0c-b32c-93fe6ea2b3b9', 'odm-import/insert-item', 'importer-1', 'FILE-1', '{"item_group_id":"c9097569-8f6e-5919-9061-5db0a477047d","item_oid":"I5","data_type":"string","value_string":"y"}', 5, '000000.000001.000000.000000.000000.000000'),
        |  ('c7c957aa-6164-5958-80cb-00724b5dcafe', 'odm-import/insert-item', 'importer-1', 'FILE-1', '{"item_group_id":"de3c8b8e-3091-5f85-8cf0-705655df9853","item_oid":"I7","data_type":"integer","value_integer":7}', 5, '000000.000003.000000.000000.000000.000000'),
        |  ('4d15f4cd-a66e-5956-9cab-c4ab1afc2651', 'odm-import/remove-item', 'importer-1', 'FILE-1', '{"item_group_id":"ff2488a3-c6b8-59bd-b285-573153b57eca","item_oid":"I8"}', 5, '000000.000003.000001.000000.000000.000000'),
        |  ('a065c220-4453-54a8-8f6c-6660640c17e2', 'odm-import/update-item', 'importer-1', 'FILE-1', '{"item_id":"aa9cedff-eaff-5f00-af87-828ea2609ef8","data_type":"float","value_float":1.5}', 5, '000000.000003.000001.000000.000000.000001')
        |) t(id, name, sub, file_oid, params_json, level, doc_pos)
        |ORDER BY level, name, params_json""".stripMargin,
    "c04_broker_decode" ->
      """SELECT * FROM (VALUES
        |  ('command', 'ack', CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'baf08666-b9fb-5f9f-a100-2af10593f726', 'odm-import/insert-subject', 'importer-1', 'FILE-1', '{"study_id":"e0613ddc-8747-503d-8c70-2a4d9589ff08","subject_key":"SK01"}', 1, '000000.000000'),
        |  ('command', 'ack', CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), '8ecc7786-c77b-5653-9bb6-a61e587bbe96', 'odm-import/remove-subject', 'importer-1', 'FILE-1', '{"study_id":"e0613ddc-8747-503d-8c70-2a4d9589ff08","subject_key":"SK03"}', 1, '000000.000002'),
        |  ('command', 'ack', CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'ff40841d-71e4-5c02-b1ca-5831199f94a1', 'odm-import/upsert-subject', 'importer-1', 'FILE-1', '{"study_id":"e0613ddc-8747-503d-8c70-2a4d9589ff08","subject_key":"SK02"}', 1, '000000.000001'),
        |  ('command', 'ack', CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'cb1345f7-9fdf-560d-9773-a4eb83331759', 'odm-import/insert-study-event', 'importer-1', 'FILE-1', '{"subject_id":"a25f047f-a387-54ce-8096-891157b6381e","study_event_oid":"SE01"}', 2, '000000.000000.000000'),
        |  ('command', 'ack', CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'f2c29ccd-697d-5f8f-bf74-d18f19bf3796', 'odm-import/insert-study-event', 'importer-1', 'FILE-1', '{"subject_id":"a287c159-932c-5938-9727-af3b639297ad","study_event_oid":"SE04"}', 2, '000000.000003.000000'),
        |  ('command', 'ack', CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), '3239ba99-a23c-5957-8573-d7989ccd8fd3', 'odm-import/upsert-study-event', 'importer-1', 'FILE-1', '{"subject_id":"00fcdbee-9db0-5540-9f5a-7b6c252e8cc9","study_event_oid":"SE02"}', 2, '000000.000001.000000'),
        |  ('command', 'ack', CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'cff1cf1f-01f8-5d7a-a64f-f2e394d668e3', 'odm-import/insert-form', 'importer-1', 'FILE-1', '{"study_event_id":"58bab24f-d44a-585c-8b40-a59aadeac43a","form_oid":"FM2"}', 3, '000000.000001.000000.000000'),
        |  ('command', 'ack', CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), '2081d530-e18b-5b92-ab04-550d99f785a5', 'odm-import/insert-form', 'importer-1', 'FILE-1', '{"study_event_id":"dd951c5a-34d1-514b-a2e5-3a5f0f689ba4","form_oid":"FM4"}', 3, '000000.000003.000000.000000'),
        |  ('command', 'ack', CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), '9ba7558e-7fc1-5c8e-b21a-da1b263e5d7a', 'odm-import/insert-form', 'importer-1', 'FILE-1', '{"study_event_id":"e0dcd145-7051-598a-8899-3797b3dad28c","form_oid":"FM1"}', 3, '000000.000000.000000.000000'),
        |  ('command', 'ack', CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), '77075f0e-96ab-55f9-a440-ba35feba25d4', 'odm-import/insert-item-group', 'importer-1', 'FILE-1', '{"form_id":"270da087-987f-55f1-b315-4a674444ef6c","item_group_oid":"IG4"}', 4, '000000.000003.000000.000000.000000'),
        |  ('command', 'ack', CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'bdd41418-da5a-51b9-94ed-f4bcb8d86542', 'odm-import/insert-item-group', 'importer-1', 'FILE-1', '{"form_id":"31981082-9bcd-5d10-b243-5934033831ee","item_group_oid":"IG1"}', 4, '000000.000000.000000.000000.000000'),
        |  ('command', 'ack', CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), '27da9dfe-bf3b-5881-87e7-0a15a1e473dd', 'odm-import/insert-item-group', 'importer-1', 'FILE-1', '{"form_id":"d1a58fd1-317e-5828-88d2-7e8e036b0095","item_group_oid":"IG2"}', 4, '000000.000001.000000.000000.000000'),
        |  ('command', 'ack', CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), '33638d9d-b05e-5b0c-b32c-93fe6ea2b3b9', 'odm-import/insert-item', 'importer-1', 'FILE-1', '{"item_group_id":"c9097569-8f6e-5919-9061-5db0a477047d","item_oid":"I5","data_type":"string","value_string":"y"}', 5, '000000.000001.000000.000000.000000.000000'),
        |  ('command', 'ack', CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'c7c957aa-6164-5958-80cb-00724b5dcafe', 'odm-import/insert-item', 'importer-1', 'FILE-1', '{"item_group_id":"de3c8b8e-3091-5f85-8cf0-705655df9853","item_oid":"I7","data_type":"integer","value_integer":7}', 5, '000000.000003.000000.000000.000000.000000'),
        |  ('command', 'ack', CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'a9115ed5-dabe-5648-88fb-a9d77b8a38cc', 'odm-import/insert-item', 'importer-1', 'FILE-1', '{"item_group_id":"f891510b-a636-5657-9d4b-95bb5c9576d6","item_oid":"I1","data_type":"string","value_string":"x"}', 5, '000000.000000.000000.000000.000000.000000'),
        |  ('command', 'ack', CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), '6299efe1-f496-5c9d-8aa6-8b66c2d915bd', 'odm-import/insert-item', 'importer-1', 'FILE-1', '{"item_group_id":"f891510b-a636-5657-9d4b-95bb5c9576d6","item_oid":"I2","data_type":"integer","value_integer":42}', 5, '000000.000000.000000.000000.000000.000001'),
        |  ('command', 'ack', CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'f04cd29f-1135-5f30-b016-079ae9161ef3', 'odm-import/insert-item', 'importer-1', 'FILE-1', '{"item_group_id":"f891510b-a636-5657-9d4b-95bb5c9576d6","item_oid":"I3","data_type":"float","value_float":3.25}', 5, '000000.000000.000000.000000.000000.000002'),
        |  ('command', 'ack', CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), '4222618d-7f6f-5d12-9220-4fd2f930b50e', 'odm-import/insert-item', 'importer-1', 'FILE-1', '{"item_group_id":"f891510b-a636-5657-9d4b-95bb5c9576d6","item_oid":"I4","data_type":"datetime","value_datetime":"2016-03-18T14:41:00.000Z"}', 5, '000000.000000.000000.000000.000000.000003'),
        |  ('command', 'ack', CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), '4d15f4cd-a66e-5956-9cab-c4ab1afc2651', 'odm-import/remove-item', 'importer-1', 'FILE-1', '{"item_group_id":"ff2488a3-c6b8-59bd-b285-573153b57eca","item_oid":"I8"}', 5, '000000.000003.000001.000000.000000.000000'),
        |  ('command', 'ack', CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'a065c220-4453-54a8-8f6c-6660640c17e2', 'odm-import/update-item', 'importer-1', 'FILE-1', '{"item_id":"aa9cedff-eaff-5f00-af87-828ea2609ef8","data_type":"float","value_float":1.5}', 5, '000000.000003.000001.000000.000000.000001'),
        |  ('invalid', 'reject', false, 'schema', '42', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR)),
        |  ('invalid', 'reject', false, 'schema', '{"id":"7f1d3a5e-0000-5000-8000-000000000001","name":"odm-import/upsert-study-event","sub":"   "}', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR)),
        |  ('invalid', 'reject', false, 'schema', '{"id":"not-a-uuid","name":"odm-import/insert-subject","sub":"importer-1"}', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR)),
        |  ('unreadable', 'none', CAST(NULL AS BOOLEAN), 'unparseable-payload', 'garbage-not-transit', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR)),
        |  ('unreadable', 'none', CAST(NULL AS BOOLEAN), 'unparseable-payload', '{"id":"tr', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR))
        |) t(branch, disposition, requeue, reason, payload, id, name, sub, file_oid, params_json, level, doc_pos)
        |ORDER BY branch, coalesce(payload, ''), coalesce(level, -1), coalesce(name, ''), coalesce(params_json, '')""".stripMargin,
    "c03_odm_quarantine" ->
      """SELECT * FROM (VALUES
        |  ('reject', 'B1', 'integer', 'not-a-number', '99dc9c94-7a40-5550-b6f9-0c2e5d14ce46', false, 'coercion'),
        |  ('reject', 'B2', 'datetime', 'yesterday-ish', '605aacbe-88e0-5d15-8c39-5e80cbd1e52f', false, 'coercion'),
        |  ('reject', 'B4', 'integer', '7', CAST(NULL AS VARCHAR), true, 'missing-parent'),
        |  ('valid', 'B3', 'float', '3.5', CAST(NULL AS VARCHAR), CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR))
        |) t(branch, item_oid, data_type, value_raw, event_id, requeue, reason)
        |ORDER BY branch, item_oid""".stripMargin)
}
