package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, BloomFilterMightContain}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL access to Spark's native bloom-filter expressions (the same pair
  * Catalyst's runtime join-pruning rule injects — see
  * InjectRuntimeFilter). Spark keeps them out of the public registry, so
  * the scale path "broadcast a fixed-size bloom of the small side, probe
  * map-side on the big side" is otherwise unreachable from SQL/DataFrames.
  *
  * `graft_bloom_agg(xxhash64-or-long [, expectedItems [, numBits]])`
  * builds the sketch; `graft_might_contain(bloomBinary, longHash)` probes
  * it. The bloom argument must be a constant or scalar subquery (the
  * expression's own contract) — exactly the broadcast-once shape wanted.
  */
object BloomFunctions {
  def register(spark: SparkSession): Unit = RegisterOnce(spark, "graft_bloom") {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) => children.size match {
        case 1 => new BloomFilterAggregate(children.head)
        case 2 => new BloomFilterAggregate(children(0), children(1))
        case _ => new BloomFilterAggregate(children(0), children(1), children(2))
      })
    reg.registerFunction(FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      (children: Seq[Expression]) => BloomFilterMightContain(children(0), children(1)))
  }
}
