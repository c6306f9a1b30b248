package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.SparkSession
import graft.extract.Extract

/** Static bridge the generated code calls — keeps `doGenCode` a one-line
  * invoke so the expression participates in whole-stage codegen (no
  * interpreted fallback on the hot path).
  */
object ExtractTurnBridge {
  def eval(text: UTF8String): InternalRow = {
    val e = Extract.extractTurn("", 0, if (text == null) null else text.toString)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(e.doc_type),
      UTF8String.fromString(e.extracted_text),
      UTF8String.fromString(Extract.fieldsToJson(e.fields)),
      UTF8String.fromString(Extract.fieldsToJson(e.field_src)),
      UTF8String.fromString(Extract.sectionsToJson(e.sections)),
      e.signature_present,
      e.confidence,
      UTF8String.fromString(e.status)))
  }
}

/** `extract_turn(text)` — the fused per-turn extractor as a native
  * Catalyst scalar expression returning a typed struct. Preference path
  * (b) of the operator policy: composes into any expression pipeline
  * (filters/projections around it stay codegen'd and pushdown-able),
  * unlike a mapPartitions stage which fences the plan.
  *
  * Reference semantics: the full §2.5-2.8 pipeline of SURVEY.md
  * (classify -> anchors -> banks -> signature -> confidence).
  */
case class ExtractTurnExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ExtractTurnExpr.schema

  override def prettyName: String = "extract_turn"

  override protected def nullSafeEval(input: Any): Any =
    ExtractTurnBridge.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.ExtractTurnBridge.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): ExtractTurnExpr =
    copy(child = newChild)
}

object ExtractTurnExpr {
  val schema: StructType = StructType(Seq(
    StructField("doc_type", StringType, nullable = false),
    StructField("extracted_text", StringType, nullable = false),
    StructField("fields", StringType, nullable = false),
    StructField("field_src", StringType, nullable = false),
    StructField("sections", StringType, nullable = false),
    StructField("signature_present", BooleanType, nullable = false),
    StructField("confidence", DoubleType, nullable = false),
    StructField("status", StringType, nullable = false)))

  /** Register `extract_turn` in the session's function registry so it is
    * usable from SQL and via `functions.call_function`.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "extract_turn", exprs => ExtractTurnExpr(exprs.head), "scala_udf")
}
