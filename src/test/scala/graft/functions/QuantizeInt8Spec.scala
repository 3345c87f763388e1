package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[QuantizeInt8]] contract: qᵢ = clamp(floor(cᵢ·scale + 0.5), ±scale),
  * null element → NULL result, and the codegen and interpreted paths
  * agree — the `sim_sq_topk` oracle depends on the floor formula being
  * bitwise-identical to DuckDB's `floor(c * 127 + 0.5)`.
  */
class QuantizeInt8Spec extends SparkSpec {

  test("quantizes with floor(c*127 + 0.5) and clamps to ±127") {
    import spark.implicits._
    val got = Seq(Seq(0.0f, 1.0f, -1.0f, 0.5f, -0.5f, 0.0039f, 2.0f, -2.0f))
      .toDF("v")
      .select(QuantizeInt8.quantize(col("v")))
      .as[Seq[Int]].head()
    // floor(0.5*127+0.5)=floor(64.0)=64; floor(-0.5*127+0.5)=floor(-63.0)=-63
    // 0.0039*127+0.5=0.99553→0; out-of-range ±2.0 clamps to ±127
    assert(got == Seq(0, 127, -127, 64, -63, 0, 127, -127))
  }

  test("null element nulls the whole code; null array stays null") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(Some(0.25f), None))),
      (2L, None),
      (3L, Some(Seq(Some(0.25f), Some(-0.75f))))).toDF("id", "v")
    val got = df.select(col("id"), QuantizeInt8.quantize(col("v")).as("q"))
      .orderBy("id")
      .collect()
      .map(r => if (r.isNullAt(1)) null else r.getSeq[Int](1))
    assert(got(0) == null && got(1) == null)
    // floor(0.25*127+0.5)=floor(32.25)=32; floor(-0.75*127+0.5)=floor(-94.75)=-95
    assert(got(2) == Seq(32, -95))
  }

  test("interpreted eval agrees with the codegen path") {
    import spark.implicits._
    val a = Array(0.1f, -0.9f, 0.999f)
    val expr = QuantizeInt8(
      org.apache.spark.sql.catalyst.expressions.Literal.create(a,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val interp = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray().toSeq
    val viaDf = Seq(a.toSeq).toDF("v")
      .select(QuantizeInt8.quantize(col("v"))).as[Seq[Int]].head()
    assert(interp == viaDf)
  }

  test("NaN component is pinned to code 0 on both eval paths (r6 ADVICE)") {
    import spark.implicits._
    // codegen path
    val viaDf = Seq(Seq(Float.NaN, 1.0f, -0.5f)).toDF("v")
      .select(QuantizeInt8.quantize(col("v"))).as[Seq[Int]].head()
    assert(viaDf == Seq(0, 127, -63))
    // interpreted path
    val expr = QuantizeInt8(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(Float.NaN, 1.0f, -0.5f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val interp = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray().toSeq
    assert(interp == Seq(0, 127, -63))
  }

  test("quantized dot product is exact integer arithmetic (sqTopK invariant)") {
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
    // every quantized self-dot must be an exact nonneg integer ≤ 64·127²
    val bad = e.select(
        DotProduct.dot(QuantizeInt8.quantize(col("embedding")),
          QuantizeInt8.quantize(col("embedding"))).as("d"))
      .filter(col("d") =!= floor(col("d")) || col("d") < 0 ||
        col("d") > 64L * 127 * 127)
      .count()
    assert(bad == 0)
  }
}
