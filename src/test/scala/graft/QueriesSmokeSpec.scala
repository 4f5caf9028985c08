package graft

/** Every registered query runs at sf0.001; the flagship entry returns rows
  * (the driver's t1 smoke). Oracle hash-matching is covered by
  * graft.Verify + tools/compare_oracle.py (see .claude/skills/verify). */
class QueriesSmokeSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("entry returns rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every queries entry has matching column names with its oracle's aliases intent (runs, schema non-empty)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, name)
      assert(df.count() >= 0, name)
    }
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every queries entry has an oracle (full-strength correctness gate)") {
    // since round 3 there are no rows-only queries: a new operator must
    // ship with its DuckDB oracle or this fails loudly
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"query without oracle: $missing")
  }
}
