package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.text.PorterStemmer

/** Porter stemming as a native Catalyst expression WITH code generation —
  * the preferred extension mechanism from the builder brief ("a native
  * Catalyst Expression (with doGenCode) beats a Scala UDF"). Compared to
  * the `udf` wrapper ([[graft.text.Tokenizer.stemWordUdf]]):
  * no ScalaUDF closure dispatch, no extra nullability wrapper, and the
  * call stays inside WholeStageCodegen as a direct static method call.
  *
  * Registered as the SQL function `porter_stem` by
  * [[graft.plans.GraftExtensions]].
  */
case class PorterStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"porter_stem requires a string argument, got ${child.dataType.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    PorterStem.stemUTF8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PorterStem.stemUTF8($c)")
  override protected def withNewChildInternal(newChild: Expression): PorterStem =
    copy(child = newChild)
  override def prettyName: String = "porter_stem"
}

object PorterStem {
  /** Static entry point referenced by the generated code. */
  def stemUTF8(u: UTF8String): UTF8String =
    UTF8String.fromString(PorterStemmer.stem(u.toString))

  /** Column-API form: `stem(col("word"))`. */
  def stem(c: Column): Column =
    ColumnShim.column(PorterStem(ColumnShim.expression(c)))
}
