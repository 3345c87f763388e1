package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The codegen [[DotProduct]] must be drop-in bitwise-identical to the
  * interpreted `aggregate(zip_with(...))` fold it replaced (r4 VERDICT
  * #1) — same left-to-right double accumulation — or the `sim_*` /
  * `doc_embedding_norms` oracle hashes would drift.
  */
class VectorOpsSpec extends SparkSpec {

  /** The exact HOF form used through round 4. */
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("bitwise-identical to the interpreted HOF fold on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val planes = (0 until 8).map { j =>
      array(graft.ext.Similarity.planeWeights(j, 64).map(lit): _*)
    }
    // float×float (norm) and float×double-literal (hyperplane) shapes
    val checks =
      (DotProduct.dot(col("embedding"), col("embedding")) =!=
        hofDot(col("embedding"), col("embedding"))).as("self") +:
      planes.zipWithIndex.map { case (p, j) =>
        (DotProduct.dot(col("embedding"), p) =!=
          hofDot(col("embedding"), p)).as(s"p$j")
      }
    val diff = e.select(checks: _*)
    assert(diff.filter(diff.columns.map(col).reduce(_ || _)).count() == 0)
  }

  test("null array, null element, and length-mismatch all yield null (HOF parity)") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(Some(1.0f), Some(2.0f))), Some(Seq(Some(3.0f), Some(4.0f)))),
      (None, Some(Seq(Some(1.0f)))),
      (Some(Seq(Some(1.0f), None)), Some(Seq(Some(1.0f), Some(2.0f)))),
      (Some(Seq(Some(1.0f))), Some(Seq(Some(1.0f), Some(2.0f)))),
      (Some(Seq.empty[Option[Float]]), Some(Seq.empty[Option[Float]])))
      .toDF("a", "b")
    val got = df.select(DotProduct.dot(col("a"), col("b"))).as[Option[Double]].collect()
    assert(got.toSeq == Seq(Some(11.0), None, None, None, Some(0.0)))
    val hof = df.select(hofDot(col("a"), col("b"))).as[Option[Double]].collect()
    assert(got.toSeq == hof.toSeq)
  }

  test("interpreted eval path agrees with codegen") {
    import spark.implicits._
    // force the interpreted path via a literal-free eval on collected rows
    val a = Array(1.5f, -2.25f, 3.0f)
    val b = Array(0.5f, 4.0f, -1.0f)
    val expr = DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(a,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(b,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val interp = expr.eval(null).asInstanceOf[Double]
    val viaDf = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(DotProduct.dot(col("a"), col("b"))).as[Double].head()
    assert(interp == viaDf)
    assert(interp == (1.5 * 0.5 + (-2.25) * 4.0 + 3.0 * (-1.0)))
  }
}
