package graft.spark

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the analyzer hot path (SURVEY §7.3:
  * "custom `Expression` optional"). Unlike a Scala UDF, these stay inside
  * whole-stage codegen — no ScalaUDF wrapper, no extra null-safety branches,
  * no InternalRow<->JVM conversions around the call.
  */
object GraftExpressions {

  /** Called from generated code: reference tokenize (index.py:38-40). */
  def tokenizeUtf8(input: UTF8String): ArrayData = {
    val toks = graft.analysis.Analyzer.tokenize(input.toString)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Called from generated code: normalize_text (io_pdf.py:115-134). */
  def normalizeUtf8(input: UTF8String): UTF8String =
    UTF8String.fromString(graft.analysis.Analyzer.normalizeText(input.toString))
}

/** `graft_tokenize(text)` — array of analyzer tokens, codegen-native. */
case class TokenizeExpression(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokenize"

  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.tokenizeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.spark.GraftExpressions.tokenizeUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenizeExpression =
    copy(child = newChild)
}

/** `graft_normalize(text)` — deterministic NFKC analyzer normalization. */
case class NormalizeTextExpression(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.normalizeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.spark.GraftExpressions.normalizeUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpression =
    copy(child = newChild)
}

/** Session extension registering the engine's native functions:
  * `--conf spark.sql.extensions=graft.spark.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_tokenize"),
      new ExpressionInfo(classOf[TokenizeExpression].getName, "graft_tokenize"),
      (children: Seq[Expression]) => TokenizeExpression(children.head)),
    (FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(classOf[NormalizeTextExpression].getName, "graft_normalize"),
      (children: Seq[Expression]) => NormalizeTextExpression(children.head)))

  /** Imperative registration for an already-created session (the
    * spark.sql.extensions conf only applies at SparkSession build time).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
