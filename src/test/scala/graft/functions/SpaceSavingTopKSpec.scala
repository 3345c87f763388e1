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

  test("merge sums both-sided items and adds the other side's eviction floor to one-sided ones") {
    val a = agg(2)
    var b1 = a.createAggregationBuffer()
    Seq("x", "x", "y").foreach(s => b1 = a.update(b1, row(s)))
    var b2 = a.createAggregationBuffer()
    Seq("x", "z", "z", "z").foreach(s => b2 = a.update(b2, row(s)))
    // b1 = {x:(2,0), y:(1,0)} (floor 1), b2 = {x:(1,0), z:(3,1)} (floor 1
    // — z evicted x's first count... actually z arrives with buffer
    // {x:1} not yet full, so b2 = {x:(1,0), z:(3,0)}, floor 1)
    val m = a.merge(b1, a.deserialize(a.serialize(b2))) // exercise the wire format
    // x in both: (2+1, 0); y only in b1: + b2's floor 1 → (2,1);
    // z only in b2: + b1's floor 1 → (4,1); capacity 2 keeps z(4), x(3)
    assert(m("z") == ((4L, 1L)) && m("x") == ((3L, 0L)) && m.size == 2)
    // over-estimate guarantee held: true(z)=3 ≤ est 4 ≤ true+err = 4
  }

  test("merge floor preserves true <= est for items evicted on one side") {
    val a = agg(2)
    // partition A sees [x, y, z]: x evicted by z → A = {y or x…}: build it
    var bufA = a.createAggregationBuffer()
    Seq("x", "y", "z").foreach(s => bufA = a.update(bufA, row(s)))
    // A full at {x:(1,0), y:(1,0)}; z evicts min (x,1) → {y:(1,0), z:(2,1)}
    assert(!bufA.contains("x"))
    // partition B sees [x]
    var bufB = a.createAggregationBuffer()
    bufB = a.update(bufB, row("x"))
    val m = a.merge(bufB, bufA)
    // true(x) = 2; without A's floor the merge would report (1,0) and
    // UNDER-estimate; with it x = (1 + floor(A)=1, 0 + 1) = (2,1)
    assert(m("x") == ((2L, 1L)))
  }

  test("serialize round-trips items longer than the 64 KiB writeUTF cap") {
    val a = agg(4)
    val longItem = "m" * 100000 // > 65535 UTF-8 bytes
    var buf = a.createAggregationBuffer()
    buf = a.update(buf, row(longItem))
    buf = a.update(buf, row("short"))
    val rt = a.deserialize(a.serialize(buf))
    assert(rt(longItem) == ((1L, 0L)) && rt("short") == ((1L, 0L)))
  }

  test("SQL registration uses the SHARED fromChildren builder (GraftExtensions path)") {
    // runtime registration with the SAME builder GraftExtensions injects
    // (the sim_sql_norms pattern), so the literal-matching contract the
    // extension enforces is what this test exercises
    org.apache.spark.sql.graftshim.ColumnShim.addFunction(spark, "topk_sketch",
      children => SpaceSavingTopK.fromChildren(children))
    import spark.implicits._
    Seq("a", "b", "a").toDF("w").createOrReplaceTempView("tks")
    val got = spark.sql(
      """SELECT x.item AS item, x.est_count AS est_count
        |FROM (SELECT explode(topk_sketch(w, 1, 8)) AS x FROM tks)""".stripMargin)
      .as[(String, Long)].collect()
    assert(got.toSeq == Seq(("a", 2L)))
    // non-literal k rejected by the shared builder
    val err = intercept[Exception] {
      spark.sql("SELECT topk_sketch(w, 1 + 1, 8) FROM tks").collect()
    }
    assert(err.getMessage.contains("integer literal") ||
      Option(err.getCause).exists(_.getMessage.contains("integer literal")))
  }

  test("fromChildren builds from parser-produced integer literals; rejects others") {
    import org.apache.spark.sql.catalyst.expressions.{Add, Literal}
    val built = SpaceSavingTopK.fromChildren(Seq(
      BoundReference(0, StringType, nullable = true), Literal(3), Literal(16)))
    assert(built.k == 3 && built.capacity == 16)
    intercept[IllegalArgumentException] {
      SpaceSavingTopK.fromChildren(Seq(
        BoundReference(0, StringType, nullable = true),
        Add(Literal(1), Literal(2)), Literal(16)))
    }
  }
}
