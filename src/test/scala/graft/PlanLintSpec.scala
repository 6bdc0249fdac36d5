package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Scale lint over EVERY registered query's physical plan: the two shapes
  * that silently stop scaling — a cartesian product (all-pairs work) and an
  * unpartitioned window (every row through one task) — must never appear.
  * BroadcastNestedLoopJoin is deliberately NOT banned: the ANN queries use
  * it intentionally for broadcast-side non-equi joins, where the large side
  * stays partition-parallel. This encodes SCALE.md's rules as a regression
  * gate instead of a review convention. */
class PlanLintSpec extends SparkSpec {

  test("no registered query plans a cartesian product or an unpartitioned window") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan
      val cartesian = plan.collectWithSubqueries {
        case c: CartesianProductExec => c
      }
      assert(cartesian.isEmpty, s"$name plans a CartesianProduct:\n$plan")
      val unpartitioned = plan.collectWithSubqueries {
        case w: WindowExec if w.partitionSpec.isEmpty => w
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w
      }
      assert(unpartitioned.isEmpty, s"$name plans an unpartitioned window:\n$plan")
    }
  }
}
