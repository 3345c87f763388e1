package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Mean unsigned byte value of a binary payload as one generated loop —
  * the text-modality stat of the multimodal family
  * ([[graft.ext.Multimodal.asMediaTable]]).
  *
  * Why not `aggregate(transform(sequence(...), i -> ascii(substr(...))))`:
  * that interpreted-HOF chain was the multimodal stub's plan shape and
  * the last `ArrayAggregate` exemption in PlanSmellSpec (r7 VERDICT #4);
  * this expression is a single Java loop over the byte array inside
  * WholeStageCodegen — and it reads BYTES, so it is honest for non-ASCII
  * payloads where the `ascii(substr(...))` form silently diverged.
  *
  * Empty payload → 0.0 (mirrors the oracle's `CASE WHEN n = 0 THEN 0`);
  * NULL payload → NULL. Registered as SQL function `byte_mean` by
  * [[graft.plans.GraftExtensions]].
  */
case class ByteMean(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_mean requires a binary argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.isEmpty) 0.0
    else {
      var s = 0L; var i = 0
      while (i < b.length) { s += (b(i) & 0xff); i += 1 }
      s.toDouble / b.length
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |long $s = 0L;
         |for (int $i = 0; $i < $a.length; $i++) { $s += ($a[$i] & 0xff); }
         |${ev.value} = $a.length == 0 ? 0.0 : ((double) $s) / $a.length;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteMean =
    copy(child = newChild)

  override def prettyName: String = "byte_mean"
}

object ByteMean {
  /** Column-API form: `ByteMean.mean(col("payload"))`. */
  def mean(c: Column): Column =
    ColumnShim.column(ByteMean(ColumnShim.expression(c)))
}
