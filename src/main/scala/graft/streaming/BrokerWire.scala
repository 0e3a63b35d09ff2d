package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Wire-level command-bus binding: the reference's AMQP consumer loop
  * (broker.clj:65-95 delivery-fn) re-expressed as a pure DataFrame
  * transformation over broker-shaped records, so the SAME decode plan runs
  * over a batch frame, a file-backed stream, or a real Kafka source.
  *
  * The reference reads transit-msgpack payloads (broker.clj:57-60
  * read-transit) off `lens-sds.batch-commands` and classifies each delivery
  * three ways:
  *   1. payload unreadable (read-transit throws) → error-logged, message
  *      neither acked nor rejected (broker.clj:68-75);
  *   2. readable but fails the Command schema — id Uuid, name Keyword,
  *      sub NonBlankStr (broker.clj:30-38) → error-logged + basic.reject,
  *      requeue false (broker.clj:76-82);
  *   3. valid → handle-command + ack (handler failures reject with the
  *      requeue flag from ex-data — that split is c03's surface, not this
  *      layer's; broker.clj:84-94).
  *
  * Wire format here is JSON bytes, not transit-msgpack — the survey's
  * declared substitution (SURVEY.md §3): msgpack needs a codec dependency
  * this build bans, and the classification semantics (the part a migrating
  * user must keep) are format-independent. The record shape mirrors what
  * `spark-sql-kafka`'s source yields — (key BINARY, value BINARY, topic
  * STRING, partition INT, offset BIGINT, timestamp TIMESTAMP) — so
  * [[decode]] drops onto a real topic unchanged; only [[kafkaSource]]
  * needs the connector jar, absent from this sandbox (documented there).
  */
object BrokerWire {

  /** What a Kafka consumer source yields per record (the broker-assigned
    * columns — partition/offset/timestamp — exist only consumer-side). */
  val consumerSchema: StructType = StructType.fromDDL(
    "key BINARY, value BINARY, topic STRING, partition INT, " +
      "offset BIGINT, timestamp TIMESTAMP")

  /** RFC-4122 shape for the Command schema's `id Uuid` check. Anchored
    * with \z, not $: Java's $ also matches BEFORE a trailing newline, so
    * a newline-terminated id would slip a $-anchored check. */
  private val UuidRe =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\\z"

  /** Envelope fields serialized alongside `params`. The reference Command
    * schema is an OPEN map ({Any Any}, broker.clj:30-38) so the extra keys
    * (file_oid/level/doc_pos — what commandTopicStream publishes) ride the
    * same payload and round-trip losslessly. */
  private val EnvelopeFields =
    Seq("id", "name", "sub", "file_oid", "level", "doc_pos")

  /** Producer side (what `writeStream.format("kafka")` expects: key, value,
    * topic): serialize an enveloped command frame (OdmPipeline.enveloped
    * columns) to wire records. `params` is spliced into the envelope as a
    * raw JSON OBJECT (the reference's Params schema is a map,
    * broker.clj:25-26) — the already-canonical params_json substring
    * survives encode→decode byte-identically, which is what lets the
    * round-trip spec demand exact equality with the c01 golden stream. */
  def encode(commands: DataFrame, topic: String): DataFrame = {
    val head = to_json(struct(EnvelopeFields.map(col): _*))
    commands
      .withColumn("h", head)
      // splice params between the braces; concat_ws drops the null side,
      // so an all-null envelope ('{}' head — to_json omits null fields)
      // still yields valid JSON and classifies at the SCHEMA check, not
      // as an unreadable payload. A BLANK params_json (empty or
      // whitespace-only — rlike(\S) guards both) is treated like null
      // (field omitted): splicing it would emit `"params":}` or
      // `"params": }` — invalid JSON — turning a producer-side blank
      // into a poison message that classifies 'unreadable' instead of
      // failing the schema check
      .withColumn("hb", expr("substring(h, 2, length(h)-2)"))
      .withColumn("json",
        concat(lit("{"),
          concat_ws(",",
            when(length(col("hb")) > 0, col("hb")),
            when(col("params_json").rlike("\\S"),
              concat(lit("\"params\":"), col("params_json")))),
          lit("}")))
      .select(
        col("id").cast("binary").as("key"),
        col("json").cast("binary").as("value"),
        lit(topic).as("topic"),
        // the producer's partitioner: hash(key) mod N, like Kafka's default
        pmod(xxhash64(col("id")), lit(4)).cast("int").as("partition"))
  }

  /** Consumer side: classify every delivery exactly as delivery-fn does.
    * Requires only a `value BINARY` column (extra consumer columns pass
    * through untouched ahead of the decoded fields). Output adds:
    *   branch      'command' | 'invalid' | 'unreadable'
    *   disposition 'ack' | 'reject' | 'none' (unreadable is only LOGGED —
    *               broker.clj:68-75 neither acks nor rejects)
    *   requeue     false on reject (broker.clj:82 default), null otherwise
    *   reason      'unparseable-payload' | 'schema' | null
    *   payload     the raw value text on the two error branches (what the
    *               reference's error log carries), null on the command path
    * plus the decoded envelope columns (null outside the command branch).
    * The decoded output names (branch/disposition/requeue/reason/payload +
    * the envelope columns) are RESERVED — an input column with one of
    * those names is replaced; every other input column passes through
    * untouched. The Command schema is an OPEN map (broker.clj:30-38
    * `Any Any`), so payload keys beyond the envelope stay reachable
    * downstream via the untouched `value` column — nothing is lost by
    * classification. Map-only — no shuffle; at scale this is the
    * per-record consumer loop fused into the scan (the payload is parsed
    * twice: the readability probe and the one envelope parse, which also
    * captures `params` as its raw JSON text). */
  def decode(wire: DataFrame): DataFrame = {
    val v = col("value").cast("string")
    // `params STRING` rides the envelope parse: Spark's Jackson path
    // re-emits a non-string field captured as STRING, byte-identical for
    // compact object input (BrokerWireSpec's adversarial round-trip pins
    // this), so no second get_json_object parse is needed
    val envSchema = StructType.fromDDL(
      "id STRING, name STRING, sub STRING, file_oid STRING, " +
        "level INT, doc_pos STRING, params STRING")
    val e = from_json(v, envSchema)
    val params = e.getField("params")
    // read-transit's throw ⇔ not JSON at all; a readable non-map payload
    // (e.g. a bare 42) reaches the SCHEMA check and fails there, exactly
    // like a transit scalar would
    val unreadable = v.isNull || try_parse_json(v).isNull
    val schemaOk = // broker.clj:30-38: id Uuid, name Keyword, sub NonBlankStr
      // every conjunct null-guards its value test: a missing field must
      // read FALSE, not NULL (NULL AND TRUE = NULL would otherwise fall
      // through `when` to the command branch)
      e.getField("id").isNotNull && e.getField("id").rlike(UuidRe) &&
        // Keyword check, DELIBERATELY narrowed under the JSON substitution
        // to reader-syntax keywords: no whitespace (the Clojure reader's
        // whitespace IS Character.isWhitespace, which \p{javaWhitespace}
        // matches exactly — (?U)'s Unicode White_Space set disagrees on
        // NBSP and the U+001C-1F separators), non-empty. The reference's
        // s/check is a TYPE check and (keyword "a b") / (keyword "") are
        // valid Keyword instances that transit round-trips — JSON has no
        // keyword type, so such names classify 'invalid' here but 'valid'
        // there. \z-anchored for the same trailing-newline reason as UuidRe
        e.getField("name").isNotNull &&
        e.getField("name").rlike("^\\P{javaWhitespace}+\\z") &&
        // NonBlankStr = at least one non-whitespace char under EXACTLY
        // clojure.string/blank?'s notion of whitespace
        // (Character.isWhitespace = \p{javaWhitespace}): a U+3000-only
        // sub fails (isWhitespace true) while an NBSP-only sub PASSES
        // (isWhitespace false — NBSP is non-breaking by definition);
        // Spark's trim() strips only ASCII space, so a tab-only sub
        // would pass a trim-based check
        e.getField("sub").isNotNull &&
        e.getField("sub").rlike("\\P{javaWhitespace}") &&
        // Params is a MAP (broker.clj:25-26): a present non-object params
        // fails the schema, mirroring s/check on {Any Any} — including a
        // present EXPLICIT-null ("params":null), which s/check on an
        // optional key rejects. from_json's STRING capture can't tell
        // missing from JSON-null, so absence of the KEY is probed with
        // json_object_keys; the && short-circuits, so that extra parse
        // runs only on params-null rows, never on the command hot path.
        // Known corner of the JSON substitution: STRING capture strips
        // quotes, so a params whose value is the *string* "{...}" passes
        // this test (transit, being typed, would reject it) — an
        // object-typed wire format closes it; the JSON wire cannot
        ((params.isNull &&
          !coalesce(array_contains(json_object_keys(v), "params"), lit(false))) ||
          (params.isNotNull && params.startsWith("{")))
    val branch = when(unreadable, "unreadable")
      .when(!schemaOk, "invalid").otherwise("command")
    def commandOnly(c: Column): Column =
      when(branch === "command", c)
    wire
      .withColumn("branch", branch)
      .withColumn("disposition",
        when(branch === "command", "ack")
          .when(branch === "invalid", "reject")
          .otherwise("none"))
      .withColumn("requeue",
        when(branch === "invalid", lit(false)).otherwise(lit(null).cast("boolean")))
      .withColumn("reason",
        when(branch === "unreadable", "unparseable-payload")
          .when(branch === "invalid", "schema")
          .otherwise(lit(null).cast("string")))
      .withColumn("payload", when(branch =!= "command", v))
      .withColumn("id", commandOnly(e.getField("id")))
      .withColumn("name", commandOnly(e.getField("name")))
      .withColumn("sub", commandOnly(e.getField("sub")))
      .withColumn("file_oid", commandOnly(e.getField("file_oid")))
      .withColumn("params_json", commandOnly(params))
      .withColumn("level", commandOnly(e.getField("level")))
      .withColumn("doc_pos", commandOnly(e.getField("doc_pos")))
  }

  /** Deploy-time binding to a real topic. This sandbox ships no
    * spark-sql-kafka connector jar (and no broker), so this method is the
    * documented seam, not a tested path: with
    * `org.apache.spark:spark-sql-kafka-0-10_2.13` on the deploy classpath
    * it yields exactly [[consumerSchema]], and `decode(kafkaSource(...))`
    * is the reference's consumer loop. Everything else in this object is
    * exercised against broker-shaped frames and a file-backed stream
    * (BrokerWireSpec). */
  def kafkaSource(spark: SparkSession, bootstrapServers: String,
      topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(col("key"), col("value"), col("topic"), col("partition"),
        col("offset"), col("timestamp"))
}
