package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two array<float> columns — the hot inner loop
  * of every similarity/dedup operator (l03 top-k, l03b/l03c ANN, l02e
  * embedding near-dup).
  *
  * Why an Expression and not `aggregate(zip_with(...))`: Spark's
  * higher-order functions are CodegenFallback — every element evaluates a
  * lambda interpreter-style, and a candidate-pair join runs that fold
  * millions of times. This compiles to a tight primitive loop inside
  * whole-stage codegen (SURVEY.md §4.2's "custom Expression where the
  * built-in can't express it efficiently").
  *
  * IEEE parity contract: accumulates left-to-right in double, exactly the
  * evaluation order of both the `aggregate(zip_with(...))` fold it
  * replaces and DuckDB's `list_sum(list_transform(...))` oracle — results
  * are bit-identical, so oracled queries can swap it in freely.
  * norm(v) = sqrt(vec_dot(v, v)) reproduces the squared-sum fold too.
  *
  * Null semantics (matches zip_with+aggregate): null array → null;
  * mismatched lengths or a null element → null (zip_with pads the shorter
  * side with nulls, which poisons the sum).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object VecMath {
  /** SQL-registry entry point: SELECT vec_dot(a, b). Idempotent — query
    * builders call it before constructing plans that use the function. */
  def register(spark: SparkSession): Unit = RegisterOnce(spark, "vec_dot") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => FloatVecDot(exprs.head, exprs(1)), "built-in")
  }
}
