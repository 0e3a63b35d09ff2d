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
}
