package graft

import org.apache.spark.sql.functions._
import graft.functions.{FloatVecDot, VecMath}

/** FloatVecDot: real codegen compilation, bit-identical parity with the
  * higher-order-function fold it replaces, and zip_with-compatible null
  * semantics. */
class VecMathSpec extends SparkSuite {

  test("vec_dot generated code compiles and evaluates") {
    import org.apache.spark.sql.catalyst.expressions.{Alias, BoundReference}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val t = ArrayType(FloatType)
    val expr = FloatVecDot(
      BoundReference(0, t, nullable = true), BoundReference(1, t, nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(Alias(expr, "d")()))
    val row = proj(InternalRow(
      ArrayData.toArrayData(Array(1.0f, 2.0f, 3.0f)),
      ArrayData.toArrayData(Array(4.0f, 5.0f, 6.0f))))
    assert(row.getDouble(0) === 32.0)
  }

  test("vec_dot is bit-identical to the aggregate(zip_with(..)) fold on real embeddings") {
    VecMath.register(spark)
    val emb = Tables.embeddings(spark, sf).limit(200)
    val both = emb.select(
      expr("vec_dot(embedding, embedding)").as("native"),
      expr("aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)").as("hof"))
    // bit-identical, not approximately equal: same left-to-right order
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("vec_dot null semantics match zip_with: mismatch or null element -> null") {
    VecMath.register(spark)
    val df = spark.sql(
      """SELECT
        |  vec_dot(CAST(array(1, 2) AS ARRAY<FLOAT>), CAST(array(1, 2, 3) AS ARRAY<FLOAT>)) AS mismatch,
        |  vec_dot(CAST(array(1, NULL) AS ARRAY<FLOAT>), CAST(array(1, 2) AS ARRAY<FLOAT>)) AS null_elem,
        |  vec_dot(CAST(NULL AS ARRAY<FLOAT>), CAST(array(1) AS ARRAY<FLOAT>)) AS null_arr,
        |  vec_dot(CAST(array() AS ARRAY<FLOAT>), CAST(array() AS ARRAY<FLOAT>)) AS empty""".stripMargin)
    val r = df.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getDouble(3) === 0.0)
  }
}
