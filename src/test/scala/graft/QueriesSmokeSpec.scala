package graft

/** Every registered query runs and the flagship entry returns rows —
  * value correctness is the driver's DuckDB gate (tools/compare.py
  * locally); this suite catches runtime regressions fast. */
class QueriesSmokeSpec extends SparkSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has either an oracle or a documented skip") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // approximate/hash-dependent results can't have a DuckDB oracle
    val allowed = Set("agg_approx_count_distinct", "dedup_minhash",
      "dedup_simhash_pairs", "sim_lsh_topk", "sim_ivf_topk")
    assert(noOracle.subsetOf(allowed), s"queries missing oracle: ${noOracle -- allowed}")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name executes") {
      val n = fn(spark, sf).count()
      assert(n >= 0)
    }
  }
}
