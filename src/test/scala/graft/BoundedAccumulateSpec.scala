package graft

import org.apache.spark.sql.functions._
import graft.plans.BoundedAccumulate

/** The custom physical operator: clamped running sums must match a
  * driver-side replay of the recurrence exactly, and the plan must be
  * one exchange + sort feeding the custom exec node. */
class BoundedAccumulateSpec extends SparkSuite {
  import spark.implicits._

  private val rows = Seq(
    ("a", 1L, 5.0), ("a", 2L, 4.0), ("a", 3L, -20.0), ("a", 4L, 3.0),
    ("b", 1L, -7.0), ("b", 2L, 12.0), ("b", 3L, 12.0), ("b", 4L, -1.0))
    .toDF("k", "seq", "delta")

  test("recurrence matches a sequential replay, both bounds active") {
    val r = BoundedAccumulate.boundedRunningSum(
        rows, Seq("k"), Seq("seq"), "delta", lo = 0.0, hi = 10.0)
      .select($"k", $"seq", $"balance").collect()
      .map(x => (x.getString(0), x.getLong(1)) -> x.getDouble(2)).toMap
    // a: 5 → 9 → max(0,-11)=0 → 3 ; b: max(0,-7)=0 → 10(cap) → 10 → 9
    assert(r === Map(("a", 1L) -> 5.0, ("a", 2L) -> 9.0, ("a", 3L) -> 0.0,
      ("a", 4L) -> 3.0, ("b", 1L) -> 0.0, ("b", 2L) -> 10.0,
      ("b", 3L) -> 10.0, ("b", 4L) -> 9.0))
  }

  test("plan is exchange + sort + the custom exec — no window, no loop") {
    val df = BoundedAccumulate.boundedRunningSum(
      rows, Seq("k"), Seq("seq"), "delta", 0.0, 10.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BoundedAccumulate"), plan) // exec prints without the Exec suffix
    assert(plan.contains("Exchange") || plan.contains("ShuffleQueryStage"),
      "missing the key-clustered exchange:\n" + plan)
    assert(plan.contains("Sort"), "missing the required ordering sort:\n" + plan)
  }

  test("key groups are independent across many partitions") {
    val big = (1 to 2000).map(i => (s"k${i % 37}", i.toLong, (i % 13 - 6).toDouble))
      .toDF("k", "seq", "delta").repartition(16)
    val got = BoundedAccumulate.boundedRunningSum(
        big, Seq("k"), Seq("seq"), "delta", -5.0, 5.0)
      .select($"k", $"seq", $"balance").collect()
      .map(x => (x.getString(0), x.getLong(1)) -> x.getDouble(2)).toMap
    val expected = (1 to 2000).map(i => (s"k${i % 37}", i.toLong, (i % 13 - 6).toDouble))
      .groupBy(_._1).flatMap { case (_, rs) =>
        var b = 0.0
        rs.sortBy(_._2).map { case (k, s, d) =>
          b = math.min(5.0, math.max(-5.0, b + d)); (k, s) -> b
        }
      }.toMap
    assert(got === expected)
  }

  test("ewma kernel matches the sequential definition") {
    val r = BoundedAccumulate.ewma(rows, Seq("k"), Seq("seq"), "delta", alpha = 0.5)
      .select($"k", $"seq", $"ewma").collect()
      .map(x => (x.getString(0), x.getLong(1)) -> x.getDouble(2)).toMap
    // a: 5 → .5*4+.5*5=4.5 → .5*-20+.5*4.5=-7.75 → .5*3+.5*-7.75=-2.375
    assert(r(("a", 1L)) === 5.0)
    assert(r(("a", 2L)) === 4.5)
    assert(r(("a", 3L)) === -7.75)
    assert(r(("a", 4L)) === -2.375)
  }

  test("holt kernel tracks a linear ramp almost exactly") {
    // x = 10, 20, 30, ... — once the trend locks on, level ≈ x
    val ramp = (1 to 50).map(i => ("r", i.toLong, i * 10.0)).toDF("k", "seq", "delta")
    val r = BoundedAccumulate.holt(ramp, Seq("k"), Seq("seq"), "delta",
        alpha = 0.5, beta = 0.5)
      .orderBy($"seq").select($"level").collect().map(_.getDouble(0))
    assert(r.head === 10.0)
    assert(math.abs(r.last - 500.0) < 1.0, s"level ${r.last} should track x=500")
    // replay the recurrence exactly
    var (l, b) = (10.0, 0.0)
    (2 to 50).foreach { i =>
      val lNew = 0.5 * (i * 10.0) + 0.5 * (l + b)
      b = 0.5 * (lNew - l) + 0.5 * b; l = lNew
    }
    assert(r.last === l)
  }

  test("null deltas contribute zero, lo > hi rejected") {
    val withNull = Seq(("a", 1L, Some(3.0)), ("a", 2L, None), ("a", 3L, Some(1.0)))
      .toDF("k", "seq", "delta")
    val r = BoundedAccumulate.boundedRunningSum(
        withNull, Seq("k"), Seq("seq"), "delta", 0.0, 100.0)
      .orderBy($"seq").select($"balance").collect().map(_.getDouble(0))
    assert(r.toSeq === Seq(3.0, 3.0, 4.0))
    intercept[IllegalArgumentException] {
      BoundedAccumulate.boundedRunningSum(withNull, Seq("k"), Seq("seq"), "delta", 5.0, 1.0)
    }
  }
}
