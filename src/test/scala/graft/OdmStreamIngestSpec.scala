package graft

import java.nio.file.{Files, Paths}

import graft.streaming.OdmStreamIngest
import org.apache.spark.sql.functions._

/** New files landing in the directory become command micro-batches; the
  * accumulated stream equals the batch pipeline over the same files. */
class OdmStreamIngestSpec extends SparkSuite {

  test("streaming dependency gate: orphans wait, parent_ok releases, " +
      "parent_fail prunes, never-resolved parents emit nothing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import OdmStreamIngest.{GateEvent, GatedChild}
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val name = s"graft_gate_${System.nanoTime()}"
    try {
      val stream = MemoryStream[GateEvent]
      val q = OdmStreamIngest.gatedChildren(stream.toDS())
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        // batch 1: c1 orphaned; c2 released by its parent IN-batch (the
        // reference's sequential consumer order); c3 buffered under p3
        stream.addData(
          GateEvent("p1", "child", "c1"),
          GateEvent("p2", "child", "c2"),
          GateEvent("p2", "parent_ok", ""),
          GateEvent("p3", "child", "c3"),
          GateEvent("p9", "child", "c6")) // parent never resolves
        q.processAllAvailable()
        // batch 2: p1 resolves ok (c1 waited → released; c4 direct);
        // p3 fails (c3 pruned from the buffer, late c5 pruned inline)
        stream.addData(
          GateEvent("p1", "parent_ok", ""),
          GateEvent("p1", "child", "c4"),
          GateEvent("p3", "parent_fail", ""),
          GateEvent("p3", "child", "c5"))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(name).as[GatedChild].collect()
        .map(g => g.child_id -> g.status).toMap
      assert(got === Map(
        "c1" -> "released", "c2" -> "released", "c4" -> "direct",
        "c3" -> "pruned", "c5" -> "pruned"))
      // each child emitted exactly once
      assert(spark.table(name).count() === 5)
      // gate equality with the batch left_semi contract: the passed set
      // (released ∪ direct) == children semi-joined to ok parents
      val children = Seq(("p1", "c1"), ("p2", "c2"), ("p3", "c3"),
        ("p9", "c6"), ("p1", "c4"), ("p3", "c5")).toDF("parent_id", "child_id")
      val okParents = Seq("p1", "p2").toDF("p")
      val batchGate = children
        .join(okParents, col("parent_id") === col("p"), "left_semi")
        .select("child_id").as[String].collect().toSet
      val passed = got.collect {
        case (c, s) if s == "released" || s == "direct" => c
      }.toSet
      assert(passed === batchGate)
    } finally {
      prev.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
    }
  }

  test("bus-shaped command topic: streaming emission == the c01 golden set, " +
      "routed by the reference's ns.name key") {
    val dir = Files.createTempDirectory("graft_odm_topic")
    Files.copy(Paths.get(graft.odm.OdmPipeline.fixturePath()),
      dir.resolve("f1.xml"))
    val name = s"graft_odm_topic_${System.nanoTime()}"
    val q = OdmStreamIngest.commandTopicStream(spark, dir.toString,
      graft.odm.OdmQueries.BatchCmdId, "importer-1")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      val topic = spark.table(name)
      // exactly the c01 golden stream — same deterministic envelope ids,
      // same 7 columns, row for row (set compare: the stream is unordered)
      val streamed = topic.select("id", "name", "sub", "file_oid",
        "params_json", "level", "doc_pos").collect().map(_.toSeq).toSet
      val golden = graft.odm.OdmQueries.queries("c01_odm_commands")(spark, sf)
        .collect().map(_.toSeq).toSet
      assert(streamed === golden)
      // R19 topic routing: ns.name from the command keyword
      val keys = topic.select("name", "routing_key").collect()
        .map(r => r.getString(0) -> r.getString(1))
      assert(keys.nonEmpty && keys.forall { case (n, k) => k == n.replace('/', '.') })
      assert(keys.exists(_._2 == "odm-import.insert-subject"))
    } finally q.stop()
  }

  test("streaming gate on the real command topic: out-of-order acks reproduce " +
      "the c02 batch gate at the subject level") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import OdmStreamIngest.{GateEvent, GatedChild}
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // real c01 commands, not synthetic ids: children = level-2 study-event
    // commands keyed by their params' subject_id; parent_ok = the c02
    // event-log acks (every subject except SK01's)
    val env = graft.odm.OdmQueries.queries("c01_odm_commands")(spark, sf).collect()
    def param(json: String, key: String): String =
      s""""$key":"([0-9a-f-]+)"""".r.findFirstMatchIn(json).map(_.group(1)).orNull
    val children = env.filter(_.getAs[Int]("level") == 2).map { r =>
      GateEvent(param(r.getAs[String]("params_json"), "subject_id"),
        "child", r.getAs[String]("id"))
    }
    def subjectIdOf(r: org.apache.spark.sql.Row): String = {
      val js = r.getAs[String]("params_json")
      graft.functions.Uuid5.uuid5(param(js, "study_id"),
        """"subject_key":"([A-Z0-9]+)"""".r.findFirstMatchIn(js).map(_.group(1)).get)
    }
    val ackedSubjects = env.filter { r =>
      r.getAs[Int]("level") == 1 && !r.getAs[String]("params_json").contains("SK01") &&
        r.getAs[String]("name").matches(".*(insert|upsert)-subject")
    }.map(subjectIdOf).toSet
    // update pass-through (R15): a subject with tx=update emits NO command
    // — the batch gate cascades into it unconditionally, so on the bus its
    // children's parent resolves ok implicitly (no ack will ever arrive)
    val commandedSubjects = env
      .filter(r => r.getAs[Int]("level") == 1 &&
        r.getAs[String]("name").contains("subject")).map(subjectIdOf).toSet
    val passThrough = children.map(_.parent_id).toSet -- commandedSubjects
    val acks = (ackedSubjects ++ passThrough).toSeq.sorted
      .map(GateEvent(_, "parent_ok", ""))
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val name = s"graft_gate_real_${System.nanoTime()}"
    try {
      val stream = MemoryStream[GateEvent]
      val q = OdmStreamIngest.gatedChildren(stream.toDS())
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        // the bus case batch can't see: children arrive BEFORE their acks
        stream.addData(children.toIndexedSeq: _*)
        q.processAllAvailable()
        assert(spark.table(name).count() === 0) // everything orphan-buffered
        stream.addData(acks.toIndexedSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
    } finally {
      prev.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
    }
    val passed = spark.table(name).as[GatedChild].collect()
      .filter(g => g.status == "released" || g.status == "direct")
      .map(_.child_id).toSet
    // == the study-event command ids the c02 batch gate lets through
    val c02Level2 = graft.odm.OdmQueries.queries("c02_odm_gated")(spark, sf)
      .filter(col("level") === 2).select("id").collect()
      .map(_.getString(0)).toSet
    assert(passed === c02Level2)
    assert(passed.nonEmpty && !passed.contains(
      "cb1345f7-9fdf-560d-9773-a4eb83331759")) // SK01's SE01 stays pruned
  }

  test("file-arrival streaming ingest == batch command stream") {
    val dir = Files.createTempDirectory("graft_odm_stream")
    val template = new String(Files.readAllBytes(
      Paths.get(graft.odm.OdmPipeline.fixturePath())), "UTF-8")
    def drop(i: Int): Unit =
      Files.writeString(dir.resolve(s"f$i.xml"),
        template.replace("FILE-1", s"FILE-$i").replace("\"S1\"", s""""S$i""""))

    drop(1); drop(2)
    val name = s"graft_odm_stream_${System.nanoTime()}"
    val q = OdmStreamIngest.commandStream(spark, dir.toString)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 40)
      drop(3) // a new file arrives mid-stream
      q.processAllAvailable()
      assert(spark.table(name).count() === 60)
      assert(spark.table(name).select("file_oid").distinct().count() === 3)
      // micro-batched output == the batch pipeline over the same glob
      val batch = graft.odm.OdmPipeline.commands(spark, s"$dir/*.xml")
        .select("level", "name", "params_json").collect().map(_.toString).sorted
      val streamed = spark.table(name)
        .select("level", "name", "params_json").collect().map(_.toString).sorted
      assert(streamed.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("orphan gate property: the pass/prune verdict is invariant under " +
      "arrival order and micro-batch slicing (25 random scenarios, one stream)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import OdmStreamIngest.{GateEvent, GatedChild}
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // scenario-prefixed parent keys make the 25 scenarios independent rows
    // of ONE stream — the state store shards them like any other key, so
    // this also exercises concurrent per-key state
    val rnd = new scala.util.Random(7)
    val fates = Array("ok", "fail", "never")
    case class Kid(parent: String, fate: String, child: String)
    val kids = (0 until 25).flatMap { s =>
      val parents = (0 to rnd.nextInt(3)).map(p => (s"s${s}p$p", fates(rnd.nextInt(3))))
      (0 until rnd.nextInt(7)).map { c =>
        val (pk, fate) = parents(rnd.nextInt(parents.size))
        Kid(pk, fate, s"s${s}c$c")
      }
    }
    val events = rnd.shuffle(
      kids.map(k => GateEvent(k.parent, "child", k.child)) ++
        kids.map(k => (k.parent, k.fate)).distinct.collect {
          case (pk, "ok") => GateEvent(pk, "parent_ok", "")
          case (pk, "fail") => GateEvent(pk, "parent_fail", "")
        })
    val expected = kids
      .filter(_.fate != "never") // a never-resolved parent's subtree waits forever
      .map(k => k.child -> (if (k.fate == "ok") "passed" else "pruned")).toMap
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val name = s"graft_gate_prop_${System.nanoTime()}"
    try {
      val stream = MemoryStream[GateEvent]
      val q = OdmStreamIngest.gatedChildren(stream.toDS())
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        // random micro-batch cuts: 1-6 slices of the shuffled event list
        val cuts = events.grouped(1 + rnd.nextInt(events.size / 3 + 1)).toSeq
        cuts.foreach { batch =>
          stream.addData(batch: _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      val got = spark.table(name).as[GatedChild].collect()
        .map(g => g.child_id ->
          (if (g.status == "pruned") "pruned" else "passed")).toMap
      assert(got === expected)
      // exactly-once emission per gated child
      assert(spark.table(name).count() === expected.size)
    } finally {
      prev.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
    }
  }
}
