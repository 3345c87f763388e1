package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash fingerprint of the first `maxChars` characters,
  * h = fold(h·131 + codePoint(char)) mod 1e9+7, as a codegen Catalyst
  * expression — replaces the interpreted
  * `aggregate(transform(sequence(...)))` 200-lambda-step fold (r4 VERDICT
  * #6) with one generated loop over the string's code points.
  *
  * Numeric contract (keeps the `fingerprint_rolling` DuckDB oracle
  * hash-matching): identical to the HOF form —
  *  - characters are code points (Spark's `ascii` returns
  *    `codePointAt(0)` of the 1-char substring; DuckDB's `ascii`
  *    likewise), accumulated left-to-right modulo 1e9+7;
  *  - the 0-seeded fold equals DuckDB's first-element-seeded
  *    `list_reduce` because (0·131 + c₁) mod p = c₁;
  *  - empty string → 0 (the old form folded over `sequence(1,0)` =
  *    [1,0] whose `ascii("")` contributions are 0); null → null.
  */
case class RollingHash(child: Expression, maxChars: Int) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashUTF8(input.asInstanceOf[UTF8String], maxChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHash.hashUTF8($c, $maxChars)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  /** Static entry point referenced by the generated code. One pass over
    * the UTF-8 bytes via String code points — no per-character substring
    * allocation, no lambda dispatch.
    */
  def hashUTF8(u: UTF8String, maxChars: Int): Long = {
    val s = u.toString
    val n = s.length
    var acc = 0L
    var i = 0
    var cp = 0
    while (i < n && cp < maxChars) {
      val c = s.codePointAt(i)
      acc = (acc * 131L + c) % 1000000007L
      i += Character.charCount(c)
      cp += 1
    }
    acc
  }

  /** Column-API form: `hash(col("text"), 200)`. */
  def hash(c: Column, maxChars: Int): Column =
    ColumnShim.column(RollingHash(ColumnShim.expression(c), maxChars))
}
