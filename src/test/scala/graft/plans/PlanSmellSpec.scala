package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayAggregate, ScalaUDF, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}

import graft.{SparkEntry, SparkSpec}

/** Automated plan-smell audit over the whole gate (r3 VERDICT #4 asked to
  * lock the manual docs/PLANS.md grep into a failing check):
  *
  *  - NO unpartitioned window: `Window.orderBy` without `partitionBy`
  *    funnels every row through ONE task — correct at sf0.1, a
  *    single-task scale-killer at 100× (the old w3_ntile shape).
  *  - NO ScalaUDF: every scalar kernel must be a native/codegen
  *    expression (the repo rule; PorterStem is a Catalyst Expression).
  *  - NO interpreted fold HOFs (`ArrayAggregate`/`ZipWith`): Catalyst
  *    evaluates their lambdas interpreted — the ~10-30× per-element tax
  *    docs/SCALE.md documents (r4 VERDICT #1/#6; the vector and
  *    fingerprint kernels are codegen Expressions now). No exemptions:
  *    the former `multimodal_*` allowance died with the stub decoder
  *    (r7 VERDICT #4 — real codecs run in mapPartitions, and the text
  *    byte stat is the codegen `byte_mean` kernel).
  *
  * Checked on the ANALYZED logical plan at sf0.001 — plan shape, not
  * execution. `stream_*` entries are skipped: building them runs a full
  * streaming query whose result is a batch sink read (their stateful
  * plans are asserted by the streaming specs instead).
  */
class PlanSmellSpec extends SparkSpec {

  test("no gate query plans an unpartitioned window or a ScalaUDF") {
    val dir = "/root/testdata/sf0.001"
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!name.startsWith("stream_")) {
        // build ONCE and derive both plans from it — several sink queries
        // do eager writes when their DataFrame is built
        val df = fn(spark, dir)
        val plan = org.apache.spark.sql.graftshim.ColumnShim.logicalPlan(df)
        val globalWindows = plan.collect {
          case w: LogicalWindow if w.partitionSpec.isEmpty => w
        }
        if (globalWindows.nonEmpty) offenders += s"$name: unpartitioned Window"
        val udfs = plan.collect {
          case p if p.expressions.exists(_.exists(_.isInstanceOf[ScalaUDF])) => p
        }
        if (udfs.nonEmpty) offenders += s"$name: ScalaUDF"
        val hofFolds = plan.collect {
          case p if p.expressions.exists(_.exists(e =>
            e.isInstanceOf[ArrayAggregate] || e.isInstanceOf[ZipWith])) => p
        }
        if (hofFolds.nonEmpty) offenders += s"$name: interpreted ArrayAggregate/ZipWith"
        // physical (pre-AQE, planning only): a CartesianProductExec means
        // two NON-broadcast sides cross-joined — quadratic shuffle work
        // at scale. Intentional tiny-side crosses plan as
        // BroadcastNestedLoopJoin, which stays allowed.
        val physical = org.apache.spark.sql.graftshim.ColumnShim.sparkPlan(df)
        val cartesian = physical.collect {
          case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        }
        if (cartesian.nonEmpty) offenders += s"$name: CartesianProductExec"
        graft.Caches.clearPersisted()
      }
    }
    assert(offenders.isEmpty, s"plan smells: ${offenders.mkString("; ")}")
  }
}
