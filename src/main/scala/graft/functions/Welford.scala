package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** x02: typed UDAF — numerically-stable mean/variance (Welford/Chan
  * parallel-merge form). The merge step is the textbook pairwise
  * combination, so partial aggregation (map-side combine) is safe and the
  * result is independent of partitioning up to float rounding.
  */
object Welford {

  final case class Buf(n: Long, mean: Double, m2: Double)
  // Option fields → nullable output columns: var_samp of a single element
  // is NULL in Spark/DuckDB/ANSI, not NaN — keep oracle parity.
  final case class MeanVar(mean: Option[Double], varSamp: Option[Double])

  val agg: Aggregator[Double, Buf, MeanVar] = new Aggregator[Double, Buf, MeanVar] {
    def zero: Buf = Buf(0L, 0.0, 0.0)
    def reduce(b: Buf, x: Double): Buf = {
      val n = b.n + 1
      val d = x - b.mean
      val mean = b.mean + d / n
      Buf(n, mean, b.m2 + d * (x - mean))
    }
    def merge(a: Buf, b: Buf): Buf = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        Buf(n, a.mean + d * b.n / n, a.m2 + b.m2 + d * d * a.n * b.n / n)
      }
    }
    def finish(b: Buf): MeanVar = MeanVar(
      if (b.n > 0) Some(b.mean) else None,
      if (b.n > 1) Some(b.m2 / (b.n - 1)) else None)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[MeanVar] = Encoders.product[MeanVar]
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    RegisterOnce(spark, "welford") {
      spark.udf.register("welford", org.apache.spark.sql.functions.udaf(agg))
    }
}
