package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** uuid5 as a native Catalyst expression (SURVEY.md §4.2 / §7 M5): same
  * semantics as the Uuid5 UDF, but participates in whole-stage codegen —
  * the generated code calls the static evaluator directly on UTF8String
  * operands, with no ScalaUDF closure dispatch, no encoder round-trip,
  * and correct null short-circuiting generated inline.
  */
case class Uuid5Expression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"uuid5_native expects (string, string), got (${left.dataType}, ${right.dataType})")
  override def prettyName: String = "uuid5_native"

  override def nullSafeEval(ns: Any, name: Any): Any =
    Uuid5Gen.eval(ns.asInstanceOf[UTF8String], name.asInstanceOf[UTF8String])

  // NOTE: the evaluator must live on a class with a REAL static method.
  // `Uuid5Expression.eval` has no static forwarder (scalac suppresses it
  // because the case class inherits an instance `eval(InternalRow)`), so
  // generated code referencing it failed Janino resolution and silently
  // dropped every uuid5_native plan to interpreted execution.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ns, name) =>
      s"graft.functions.Uuid5Gen.eval($ns, $name)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Uuid5Expression =
    copy(left = newLeft, right = newRight)
}

/** Static evaluator shared by the interpreted and generated paths — a
  * standalone object (no companion class) so scalac emits the static
  * forwarder Janino needs. */
object Uuid5Gen {
  def eval(ns: UTF8String, name: UTF8String): UTF8String =
    UTF8String.fromString(
      Uuid5.uuid5(java.util.UUID.fromString(ns.toString), name.getBytes).toString)
}

object Uuid5Expression {
  /** Column API (requires register(spark) first — Spark 4 exposes no
    * public Expression→Column constructor, so we go through the registry). */
  def uuid5Native(ns: Column, name: Column): Column =
    org.apache.spark.sql.functions.call_function("uuid5_native", ns, name)

  /** SQL-registry entry point: SELECT uuid5_native(ns, name). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "uuid5_native", exprs => Uuid5Expression(exprs.head, exprs(1)), "built-in")
}
