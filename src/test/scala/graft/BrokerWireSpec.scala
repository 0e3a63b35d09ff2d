package graft

import graft.odm.{OdmPipeline, OdmQueries}
import graft.streaming.BrokerWire
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Wire-level broker loop (reference broker.clj:65-95): encode→decode is
  * lossless on the golden command stream, the three delivery outcomes
  * classify exactly as delivery-fn does, and the SAME decode plan runs
  * over a file-backed stream (the bus stand-in this sandbox allows). */
class BrokerWireSpec extends SparkSuite {

  private def golden = OdmPipeline.enveloped(spark, OdmPipeline.fixturePath(),
    OdmQueries.BatchCmdId, "importer-1")

  private val envCols =
    Seq("id", "name", "sub", "file_oid", "params_json", "level", "doc_pos")

  test("encode→decode round-trips the c01 golden stream byte-exactly") {
    val back = BrokerWire.decode(
        BrokerWire.encode(golden, "lens-sds.batch-commands"))
      .filter(col("branch") === "command")
      .select(envCols.map(col): _*)
      .orderBy("level", "name", "params_json")
    assert(back.collect().toSeq === golden.collect().toSeq)
    // every valid delivery acks, none carries an error surface
    val dispositions = BrokerWire.decode(
        BrokerWire.encode(golden, "t"))
      .select("disposition", "requeue", "reason", "payload")
      .distinct().collect().toSeq
    assert(dispositions === Seq(Row("ack", null, null, null)))
  }

  test("delivery classification: unreadable is log-only, schema-invalid " +
      "rejects without requeue (broker.clj:68-82)") {
    import spark.implicits._
    val wire = Seq(
      "garbage", // transit read throws
      "{\"id\":\"tr", // truncated payload
      "42", // readable scalar → fails the SCHEMA check, not the read
      """{"id":"not-a-uuid","name":"n","sub":"s"}""", // id not a Uuid
      """{"id":"7f1d3a5e-0000-5000-8000-000000000001","name":"","sub":"s"}""", // name blank
      """{"id":"7f1d3a5e-0000-5000-8000-000000000001","name":"n","sub":"  "}""", // sub blank
      """{"id":"7f1d3a5e-0000-5000-8000-000000000001","name":"n"}""", // sub missing
      """{"name":"n","sub":"s"}""", // id missing: rlike(NULL) must read false, not null
      """{"id":"7f1d3a5e-0000-5000-8000-000000000001","name":"   ","sub":"s"}""", // name not a Keyword (whitespace)
      """{"id":"7f1d3a5e-0000-5000-8000-000000000001","name":"a b","sub":"s"}""", // name not a Keyword (embedded space)
      """{"id":"7f1d3a5e-0000-5000-8000-000000000001","name":"n","sub":"s","params":42}""", // params not a map
      """{"id":"7f1d3a5e-0000-5000-8000-000000000001","name":"n","sub":"s","params":[1]}""", // params not a map
      """{"id":"7f1d3a5e-0000-5000-8000-000000000001","name":"n","sub":"s","params":null}""", // explicit-null params: present key, s/check rejects nil
      """{"id":"7f1d3a5e-0000-5000-8000-000000000001","name":"n","sub":"　"}""", // U+3000-only sub: isWhitespace true → blank
      """{"id":"7f1d3a5e-0000-5000-8000-000000000001","name":"n","sub":" "}""", // NBSP-only sub: isWhitespace FALSE → NOT blank, acks
      "{\"id\":\"7f1d3a5e-0000-5000-8000-000000000001\",\"name\":\"n\",\"sub\":\"\\u001C\"}", // U+001C-only sub (JSON-escaped; a raw 0x1C is invalid JSON): isWhitespace true → blank (Unicode White_Space says no — javaWhitespace must win)
      """{"id":"7f1d3a5e-0000-5000-8000-000000000001\n","name":"n","sub":"s"}""", // newline-terminated id: $ would match, \z must not
      """{"id":"7f1d3a5e-0000-5000-8000-000000000001","name":"n\n","sub":"s"}""", // newline-terminated name
      """{"id":"7f1d3a5e-0000-5000-8000-000000000001","name":"n","sub":"\t"}""", // tab-only sub: trim() keeps it, blank? rejects it
      """{"id":"7F1D3A5E-0000-5000-8000-000000000001","name":"x/y","sub":"s"}""" // uppercase Uuid ok
    ).toDF("p").select(col("p").cast("binary").as("value"))
    val rows = BrokerWire.decode(wire)
      .select("payload", "branch", "disposition", "requeue", "reason")
      .collect().map(r => (if (r.isNullAt(0)) "<cmd>" else r.getString(0)) ->
        ((r.getString(1), r.getString(2),
          if (r.isNullAt(3)) null else r.getBoolean(3), r.getString(4))))
    val got = rows.toMap
    assert(got("garbage") === (("unreadable", "none", null, "unparseable-payload")))
    assert(got("{\"id\":\"tr") === (("unreadable", "none", null, "unparseable-payload")))
    assert(got("42") === (("invalid", "reject", false, "schema")))
    assert(got("""{"id":"not-a-uuid","name":"n","sub":"s"}""") ===
      (("invalid", "reject", false, "schema")))
    assert(got("""{"name":"n","sub":"s"}""") ===
      (("invalid", "reject", false, "schema")))
    assert(got("""{"id":"7f1d3a5e-0000-5000-8000-000000000001","name":"n","sub":"s","params":42}""") ===
      (("invalid", "reject", false, "schema")))
    assert(got("""{"id":"7f1d3a5e-0000-5000-8000-000000000001\n","name":"n","sub":"s"}""") ===
      (("invalid", "reject", false, "schema")))
    assert(got("""{"id":"7f1d3a5e-0000-5000-8000-000000000001","name":"n","sub":"\t"}""") ===
      (("invalid", "reject", false, "schema")))
    assert(got("""{"id":"7f1d3a5e-0000-5000-8000-000000000001","name":"n","sub":"s","params":null}""") ===
      (("invalid", "reject", false, "schema")))
    assert(got("""{"id":"7f1d3a5e-0000-5000-8000-000000000001","name":"n","sub":"　"}""") ===
      (("invalid", "reject", false, "schema")))
    // U+001C: Character.isWhitespace true (blank → reject) though Unicode
    // White_Space says no — the javaWhitespace class must win
    assert(got("{\"id\":\"7f1d3a5e-0000-5000-8000-000000000001\",\"name\":\"n\",\"sub\":\"\\u001C\"}") ===
      (("invalid", "reject", false, "schema")))
    assert(rows.count(_._2._1 == "invalid") === 16)
    // the uppercase-Uuid row AND the NBSP-sub row (isWhitespace(NBSP) is
    // FALSE — non-breaking space is not blank under clojure blank?)
    assert(rows.count(_._2._1 == "command") === 2)
    assert(got("<cmd>") === (("command", "ack", null, null)))
  }

  test("an all-null envelope still encodes to VALID JSON and fails at the " +
      "schema check, not the readability probe") {
    import spark.implicits._
    val env = Seq(("x", """{"k":"v"}"""))
      .toDF("marker", "params_json")
      .select(lit(null).cast("string").as("id"), lit(null).cast("string").as("name"),
        lit(null).cast("string").as("sub"), lit(null).cast("string").as("file_oid"),
        col("params_json"), lit(null).cast("int").as("level"),
        lit(null).cast("string").as("doc_pos"))
    val r = BrokerWire.decode(BrokerWire.encode(env, "t"))
      .select("payload", "branch", "reason").head()
    assert(r === Row("""{"params":{"k":"v"}}""", "invalid", "schema"))
    // and with params ALSO null: the payload is the empty object
    val r2 = BrokerWire.decode(BrokerWire.encode(
        env.withColumn("params_json", lit(null).cast("string")), "t"))
      .select("payload", "branch").head()
    assert(r2 === Row("{}", "invalid"))
    // an EMPTY-string params_json encodes like null (field omitted) — the
    // naive splice would emit `{"params":}`, invalid JSON, and the frame
    // would classify 'unreadable' (poison) instead of failing the schema
    val r3 = BrokerWire.decode(BrokerWire.encode(
        env.withColumn("params_json", lit("")), "t"))
      .select("payload", "branch").head()
    assert(r3 === Row("{}", "invalid"))
    // ...and so does a WHITESPACE-only params_json — `{"params": }` is
    // invalid JSON too, so the blank guard must be rlike(\S), not length
    val r4 = BrokerWire.decode(BrokerWire.encode(
        env.withColumn("params_json", lit(" \t ")), "t"))
      .select("payload", "branch").head()
    assert(r4 === Row("{}", "invalid"))
  }

  test("explicit-null params rejects (s/check on a present :params nil) " +
      "while an ABSENT params acks — the key-presence probe distinguishes them") {
    import spark.implicits._
    val id = "7f1d3a5e-0000-5000-8000-000000000001"
    val wire = Seq(
      s"""{"id":"$id","name":"n","sub":"s"}""",
      s"""{"id":"$id","name":"n","sub":"s","params":null}""",
      s"""{"id":"$id","name":"n","sub":"s","params":{}}""")
      .toDF("p").select(col("p").cast("binary").as("value"))
    val got = BrokerWire.decode(wire)
      .select(col("value").cast("string"), col("branch")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got(s"""{"id":"$id","name":"n","sub":"s"}""") === "command")
    assert(got(s"""{"id":"$id","name":"n","sub":"s","params":null}""") === "invalid")
    assert(got(s"""{"id":"$id","name":"n","sub":"s","params":{}}""") === "command")
  }

  test("encode→decode round-trips 200 adversarial envelopes " +
      "(quotes, backslashes, unicode, control chars, JSON specials)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val specials = Array("\"", "\\", "/", " ", "é", "漢", "\n", "\t",
      "{", "}", "[", "]", ":", ",", "'", "a", "B", "7", "-", ".")
    def randStr(min: Int): String =
      (0 until (min + rnd.nextInt(8))).map(_ => specials(rnd.nextInt(specials.length))).mkString
    // a Command name is a Keyword — never whitespace — so the name
    // generator draws from the whitespace-free subset; sub/params stay
    // fully adversarial
    val nameSpecials = specials.filterNot(_.exists(_.isWhitespace))
    def randName: String = "odm-import/" + (0 until (1 + rnd.nextInt(8)))
      .map(_ => nameSpecials(rnd.nextInt(nameSpecials.length))).mkString
    def uuid: String = new java.util.UUID(rnd.nextLong(), rnd.nextLong()).toString
    val rows = (1 to 200).map { i =>
      (uuid, randName, randStr(0) + "x", s"FILE-$i",
        Map(s"k$i" -> randStr(0), "q" -> randStr(0)), 1 + rnd.nextInt(5),
        f"$i%06d")
    }
    val env = rows
      .toDF("id", "name", "sub", "file_oid", "params", "level", "doc_pos")
      .withColumn("params_json", to_json(col("params")))
      .select(envCols.map(col): _*)
    val back = BrokerWire.decode(BrokerWire.encode(env, "t"))
    assert(back.filter(col("branch") =!= "command").count() === 0,
      back.filter(col("branch") =!= "command")
        .select("payload", "branch").collect().take(3).mkString("; "))
    assert(back.select(envCols.map(col): _*).orderBy("id").collect().toSeq
      === env.orderBy("id").collect().toSeq)
  }

  test("decode is map-only: no exchange anywhere in the consumer loop") {
    import spark.implicits._
    val wire = Seq("x").toDF("p").select(col("p").cast("binary").as("value"))
    val plan = BrokerWire.decode(wire).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"broker decode must fuse into the scan, got:\n$plan")
  }

  test("decode preserves broker-assigned consumer columns (offset et al.)") {
    import spark.implicits._
    val wire = Seq((7L, 2, """{"id":"7f1d3a5e-0000-5000-8000-000000000001","name":"n","sub":"s"}"""))
      .toDF("offset", "partition", "p")
      .select(col("offset"), col("partition"), col("p").cast("binary").as("value"))
    val r = BrokerWire.decode(wire).select("offset", "partition", "branch").head()
    assert(r === Row(7L, 2, "command"))
  }

  test("full consumer loop on ONE streaming plan: wire bytes → decode → " +
      "dead-letter split → stateful orphan gate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.OdmStreamIngest
    import OdmStreamIngest.{GateEvent, GatedChild}
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val gateName = s"graft_loop_gate_${System.nanoTime()}"
    val dlqName = s"graft_loop_dlq_${System.nanoTime()}"
    def cmd(kind: String, parent: String, child: String): String = {
      val id = java.util.UUID.nameUUIDFromBytes(s"$kind/$parent/$child".getBytes)
      s"""{"id":"$id","name":"gate/$kind","sub":"importer-1","params":{"parent_id":"$parent","kind":"$kind","child_id":"$child"}}"""
    }
    try {
      val stream = MemoryStream[String]
      val decoded = graft.streaming.BrokerWire.decode(
        stream.toDF().select(col("value").cast("binary").as("value")))
      // dead letters leave the loop here (c03's quarantine posture) …
      val dlq = decoded.filter(col("branch") =!= "command")
        .select("branch", "disposition", "payload")
        .writeStream.format("memory").queryName(dlqName)
        .outputMode("append").start()
      // … and surviving commands feed the R15 orphan gate, still streaming
      val gated = OdmStreamIngest.gatedChildren(
        decoded.filter(col("branch") === "command")
          .select(
            get_json_object(col("params_json"), "$.parent_id").as("parent_id"),
            get_json_object(col("params_json"), "$.kind").as("kind"),
            get_json_object(col("params_json"), "$.child_id").as("child_id"))
          .as[GateEvent])
      val q = gated.toDF().writeStream.format("memory").queryName(gateName)
        .outputMode("append").start()
      try {
        stream.addData(
          cmd("child", "p1", "c1"), // arrives BEFORE its parent resolves
          "poison-not-a-command", // unreadable → dead letter, not the gate
          """{"id":"no-uuid","name":"gate/child","sub":"s"}""", // invalid
          cmd("parent_ok", "p1", ""),
          cmd("child", "p1", "c2")) // parent already ok → direct
        q.processAllAvailable(); dlq.processAllAvailable()
      } finally { q.stop(); dlq.stop() }
      val got = spark.table(gateName).as[GatedChild].collect()
        .map(g => g.child_id -> g.status).toMap
      assert(got === Map("c1" -> "released", "c2" -> "direct"))
      val dead = spark.table(dlqName).collect()
        .map(r => r.getString(2) -> r.getString(0)).toMap
      assert(dead === Map(
        "poison-not-a-command" -> "unreadable",
        """{"id":"no-uuid","name":"gate/child","sub":"s"}""" -> "invalid"))
    } finally {
      prev match {
        case Some(p) => spark.conf.set(provKey, p)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("the same decode plan runs over a file-backed stream and " +
      "accumulates to the golden command set") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wire_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_wire_ck_").toString
    val name = s"graft_wire_${System.nanoTime()}"
    try {
      val wire = BrokerWire.encode(golden, "lens-sds.batch-commands")
      wire.write.mode("overwrite").parquet(dir)
      val stream = spark.readStream.schema(wire.schema).parquet(dir)
      val q = BrokerWire.decode(stream)
        .filter(col("branch") === "command")
        .select(envCols.map(col): _*)
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table(name).orderBy("level", "name", "params_json")
      assert(got.collect().toSeq === golden.collect().toSeq)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }
}
