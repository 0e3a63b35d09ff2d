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

  def evalCmdId(batch: UTF8String, name: UTF8String, params: UTF8String,
      fileOid: UTF8String): UTF8String =
    UTF8String.fromString(Uuid5.genCmdIdJson(
      batch.toString, name.toString, params.toString, fileOid.toString))
}

/** gen-cmd-id as a native Catalyst expression: the command-envelope id
  * v5(batchCmdId, name :: sorted params ∪ {file-oid}) (reference
  * import_clinical_data.clj:288-289) evaluated inline in whole-stage
  * codegen. The byte-sequence hashing (raw 16-byte UUID params, keyword
  * colons) can't be expressed as a single uuid5_native name string, so
  * it gets its own expression rather than a ScalaUDF closure — the
  * envelope runs once per command at scale, and the UDF's encoder
  * round-trip per row was the one non-codegen step in the c01/c02 plans.
  */
case class GenCmdIdExpression(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gen_cmd_id expects 4 strings, got ${children.map(_.dataType).mkString(", ")}")
  override def prettyName: String = "gen_cmd_id"

  override def nullSafeEval(b: Any, n: Any, p: Any, f: Any): Any =
    Uuid5Gen.evalCmdId(b.asInstanceOf[UTF8String], n.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String], f.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, n, p, f) =>
      s"graft.functions.Uuid5Gen.evalCmdId($b, $n, $p, $f)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): GenCmdIdExpression =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

object Uuid5Expression {
  /** Column API (requires register(spark) first — Spark 4 exposes no
    * public Expression→Column constructor, so we go through the registry). */
  def uuid5Native(ns: Column, name: Column): Column =
    org.apache.spark.sql.functions.call_function("uuid5_native", ns, name)

  /** Column API for the envelope id (registers on first use). */
  def genCmdId(spark: SparkSession, batch: Column, name: Column,
      params: Column, fileOid: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "gen_cmd_id", batch, name, params, fileOid)
  }

  /** SQL-registry entry point: SELECT uuid5_native(ns, name) /
    * gen_cmd_id(batch, name, params_json, file_oid). */
  def register(spark: SparkSession): Unit = RegisterOnce(spark, "uuid5_native") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "uuid5_native", exprs => Uuid5Expression(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gen_cmd_id",
      exprs => GenCmdIdExpression(exprs.head, exprs(1), exprs(2), exprs(3)),
      "built-in")
  }
}
