package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.Generate
import org.apache.spark.sql.functions._

import graft.SparkSpec

class FuseExplodeCountSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    "a b c", "d e", "", null, "f").toDF("text")

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations = Seq(FuseExplodeCount)
    try body finally spark.experimental.extraOptimizations = Nil
  }

  test("count over explode fuses to sum(size) and agrees with unfused result") {
    val q = docs.select(explode(split(coalesce($"text", lit("")), " ")).as("tok"))
      .groupBy().count()
    val unfused = q.head().getLong(0)
    withRule {
      val fusedPlan = q.queryExecution.optimizedPlan
      assert(!fusedPlan.exists(_.isInstanceOf[Generate]), fusedPlan.toString)
      assert(q.head().getLong(0) == unfused)
    }
  }

  test("null arrays count as zero rows, like explode") {
    // no coalesce: null text → null array → explode emits nothing
    val q = docs.select(explode(split($"text", " ")).as("tok")).groupBy().count()
    val unfused = q.head().getLong(0)
    withRule {
      assert(!q.queryExecution.optimizedPlan.exists(_.isInstanceOf[Generate]))
      assert(q.head().getLong(0) == unfused)
    }
  }

  test("empty input still yields count = 0, not null") {
    val empty = docs.limit(0)
    val q = empty.select(explode(split($"text", " ")).as("tok")).groupBy().count()
    withRule { assert(q.head().getLong(0) == 0L) }
  }

  test("rule does NOT fire when the aggregate uses generator output or groups") {
    withRule {
      val grouped = docs.select(explode(split(coalesce($"text", lit("")), " ")).as("tok"))
        .groupBy("tok").count()
      assert(grouped.queryExecution.optimizedPlan.exists(_.isInstanceOf[Generate]))
      val maxTok = docs.select(explode(split(coalesce($"text", lit("")), " ")).as("tok"))
        .agg(max("tok"))
      assert(maxTok.queryExecution.optimizedPlan.exists(_.isInstanceOf[Generate]))
    }
  }
}
