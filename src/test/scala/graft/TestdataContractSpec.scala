package graft

import org.apache.spark.sql.types._

/** Testdata contract: the driver regenerates /root/testdata between rounds,
  * and a silent schema change (e.g. events.ts flipping between parquet
  * TIMESTAMP(NANOS) and timestamp[us]) must fail HERE with a readable
  * message, not as dozens of downstream analysis errors. Pins, per table,
  * the column names and the type CLASS each query family relies on —
  * loose enough to accept equivalent regenerations (ts may be any
  * timestamp type or a nanos long), tight enough to catch breakage.
  */
class TestdataContractSpec extends SparkSuite {

  private def typeClass(dt: DataType): String = dt match {
    case _: IntegerType | _: LongType | _: ShortType => "integral"
    case _: FloatType | _: DoubleType                => "floating"
    case _: DecimalType                              => "decimal"
    case _: StringType                               => "string"
    case _: DateType                                 => "date"
    case _: TimestampType | _: TimestampNTZType      => "timestamp"
    case _: BinaryType                               => "binary"
    case ArrayType(e, _)                             => s"array<${typeClass(e)}>"
    case other                                       => other.typeName
  }

  /** name -> required (column -> set of acceptable type classes). */
  private val contract: Map[String, Map[String, Set[String]]] = Map(
    "region"   -> Map("r_regionkey" -> Set("integral"), "r_name" -> Set("string")),
    "nation"   -> Map("n_nationkey" -> Set("integral"), "n_regionkey" -> Set("integral"),
                      "n_name" -> Set("string")),
    "customer" -> Map("c_custkey" -> Set("integral"), "c_nationkey" -> Set("integral"),
                      "c_name" -> Set("string"), "c_acctbal" -> Set("floating", "decimal"),
                      "c_mktsegment" -> Set("string")),
    "supplier" -> Map("s_suppkey" -> Set("integral"), "s_nationkey" -> Set("integral"),
                      "s_acctbal" -> Set("floating", "decimal")),
    "part"     -> Map("p_partkey" -> Set("integral"), "p_type" -> Set("string"),
                      "p_size" -> Set("integral"), "p_brand" -> Set("string"),
                      "p_retailprice" -> Set("floating", "decimal")),
    "orders"   -> Map("o_orderkey" -> Set("integral"), "o_custkey" -> Set("integral"),
                      "o_orderdate" -> Set("date", "timestamp"),
                      "o_totalprice" -> Set("floating", "decimal"),
                      "o_orderpriority" -> Set("string"), "o_orderstatus" -> Set("string")),
    "lineitem" -> Map("l_orderkey" -> Set("integral"), "l_partkey" -> Set("integral"),
                      "l_suppkey" -> Set("integral"), "l_linenumber" -> Set("integral"),
                      "l_quantity" -> Set("integral", "floating", "decimal"),
                      "l_extendedprice" -> Set("floating", "decimal"),
                      "l_discount" -> Set("floating", "decimal"),
                      "l_tax" -> Set("floating", "decimal"),
                      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
                      "l_shipdate" -> Set("date", "timestamp")),
    // events.ts: "some timestamp, or epoch-nanos long" — both generations seen.
    "events"   -> Map("event_id" -> Set("integral"), "ts" -> Set("timestamp", "integral"),
                      "user_id" -> Set("integral"), "event_type" -> Set("string"),
                      "value" -> Set("floating"), "props" -> Set("string")),
    "documents" -> Map("doc_id" -> Set("integral"), "text" -> Set("string"),
                       "lang" -> Set("string"), "source" -> Set("string"),
                       "n_chars" -> Set("integral")),
    "embeddings" -> Map("vec_id" -> Set("integral"),
                        "embedding" -> Set("array<floating>"),
                        "label" -> Set("integral"))
  )

  for ((name, cols) <- contract.toSeq.sortBy(_._1)) {
    test(s"testdata contract: $name") {
      // a NANOS-footer regeneration must surface as this spec's readable
      // type-class diff, not as the raw PARQUET_TYPE_ILLEGAL read error
      // (and not depend on another suite having set the conf first)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = Tables.table(spark, sf, name)
      val problems = violations(name, df.schema, cols)
      assert(problems.isEmpty, "\n" + problems.mkString("\n"))
      assert(df.head(1).nonEmpty, s"$name is empty at $sf")
    }
  }

  private def violations(name: String, schema: StructType,
      cols: Map[String, Set[String]]): Seq[String] = {
    val actual = schema.fields.map(f => f.name -> typeClass(f.dataType)).toMap
    cols.toSeq.flatMap { case (c, ok) =>
      actual.get(c) match {
        case None => Some(s"$name.$c MISSING (have: ${actual.keys.toSeq.sorted.mkString(", ")})")
        case Some(tc) if !ok(tc) =>
          Some(s"$name.$c is $tc, contract allows {${ok.mkString(", ")}}")
        case _ => None
      }
    }
  }

  test("testdata contract: a mangled schema FAILS the check (detector is live)") {
    val good = Tables.table(spark, sf, "events").schema
    // regeneration accidents, in decreasing subtlety: a type flip, a
    // rename, a dropped column
    val flipped = StructType(good.map(f =>
      if (f.name == "value") f.copy(dataType = StringType) else f))
    assert(violations("events", flipped, contract("events"))
      .exists(_.contains("events.value is string")), "type flip went undetected")
    val renamed = StructType(good.map(f =>
      if (f.name == "ts") f.copy(name = "event_time") else f))
    assert(violations("events", renamed, contract("events"))
      .exists(_.contains("events.ts MISSING")), "rename went undetected")
    val dropped = StructType(good.filterNot(_.name == "props"))
    assert(violations("events", dropped, contract("events"))
      .exists(_.contains("events.props MISSING")), "dropped column went undetected")
    // and the real schema passes the same path the mutants fail
    assert(violations("events", good, contract("events")).isEmpty)
  }

  test("testdata contract: events loader derives ts_ms/event_ts either way") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts_ms").dataType === LongType)
    assert(ev.schema("event_ts").dataType.isInstanceOf[TimestampType]
        || ev.schema("event_ts").dataType.isInstanceOf[TimestampNTZType])
    val r = ev.selectExpr("min(ts_ms)", "max(ts_ms)", "count(*)").head()
    assert(r.getLong(2) > 0)
    // sane epoch-ms range: 2000-01-01 .. 2100-01-01
    assert(r.getLong(0) > 946684800000L && r.getLong(1) < 4102444800000L,
      s"ts_ms range [${r.getLong(0)}, ${r.getLong(1)}] not epoch-millis — loader unit bug")
  }
}
