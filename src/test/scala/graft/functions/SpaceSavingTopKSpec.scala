package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** [[SpaceSavingTopK]] contract: exact when capacity ≥ distinct items
  * (the gate regime — equals a plain GROUP BY count), Metwally eviction
  * semantics when over capacity (est ≥ true ≤ est − err bound), and
  * partition-count-invariant results via the binary partial-state merge.
  */
class SpaceSavingTopKSpec extends SparkSpec {

  private def agg(cap: Int) =
    SpaceSavingTopK(BoundReference(0, StringType, nullable = true),
      k = math.min(3, cap), capacity = cap)

  private def row(s: String) = InternalRow(UTF8String.fromString(s))

  test("exact regime equals GROUP BY count, any partitioning") {
    import spark.implicits._
    val words = Seq.tabulate(300)(i => s"w${i % 7}") // w0 heaviest … w6 lightest
    for (parts <- Seq(1, 8)) {
      val df = words.toDF("word").repartition(parts)
      val got = df.agg(SpaceSavingTopK.topk(col("word"), k = 3, capacity = 16).as("t"))
        .select(posexplode(col("t")))
        .select(col("col.item"), col("col.est_count"), col("col.max_err"))
        .as[(String, Long, Long)].collect().toSeq
      // 300 = 7*42 + 6: w0..w5 get 43, w6 gets 42; ties break item asc
      assert(got == Seq(("w0", 43L, 0L), ("w1", 43L, 0L), ("w2", 43L, 0L)))
    }
  }

  test("eviction inherits the min counter and tracks max_err (unit-level)") {
    val a = agg(2)
    var buf = a.createAggregationBuffer()
    Seq("x", "x", "y").foreach(s => buf = a.update(buf, row(s)))
    // buffer full: {x:2, y:1}; "z" evicts the min (y,1) → z: est 2, err 1
    buf = a.update(buf, row("z"))
    assert(buf("x") == ((2L, 0L)) && buf("z") == ((2L, 1L)) && !buf.contains("y"))
    // over-estimate guarantee: true(z)=1 ≤ est(z)=2 ≤ true(z)+err(z)=2
  }

  test("merge is pointwise sum then capacity truncation (unit-level)") {
    val a = agg(2)
    var b1 = a.createAggregationBuffer()
    Seq("x", "x", "y").foreach(s => b1 = a.update(b1, row(s)))
    var b2 = a.createAggregationBuffer()
    Seq("x", "z", "z", "z").foreach(s => b2 = a.update(b2, row(s)))
    val m = a.merge(b1, a.deserialize(a.serialize(b2))) // exercise the wire format
    // x: 2+1, z: 3, y: 1 → capacity 2 keeps (x,3) and (z,3); y truncated
    assert(m("x") == ((3L, 0L)) && m("z") == ((3L, 0L)) && m.size == 2)
  }

  test("SQL registration via GraftExtensions") {
    // runtime registration on the shared test session (the sim_sql_norms
    // pattern — extensions face for sessions built without them)
    org.apache.spark.sql.graftshim.ColumnShim.addFunction(spark, "topk_sketch",
      children => SpaceSavingTopK(children.head,
        k = children(1).eval().asInstanceOf[Int],
        capacity = children(2).eval().asInstanceOf[Int]))
    import spark.implicits._
    Seq("a", "b", "a").toDF("w").createOrReplaceTempView("tks")
    val got = spark.sql(
      """SELECT x.item AS item, x.est_count AS est_count
        |FROM (SELECT explode(topk_sketch(w, 1, 8)) AS x FROM tks)""".stripMargin)
      .as[(String, Long)].collect()
    assert(got.toSeq == Seq(("a", 2L)))
  }
}
