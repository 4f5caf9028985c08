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

  test("no published query schema contains DecimalType (gate-hash stability lint)") {
    // Round-9 lesson: decimal RENDERING is engine-dependent — 7 queries
    // whose published columns were DECIMAL(38,0) hash-diverged in the
    // driver gate while being value-identical. Decimal stays legal as an
    // INTERNAL carrier (wrap-free sums); the published contract must be a
    // representation-stable type (digit STRING, or BIGINT under a proven
    // bound). This lint makes the local gate fail anything the driver
    // gate would.
    def hasDecimal(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.DecimalType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasDecimal(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasDecimal(a.elementType)
      case m: org.apache.spark.sql.types.MapType => hasDecimal(m.keyType) || hasDecimal(m.valueType)
      case _ => false
    }
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val bad = fn(spark, sf).schema.fields.filter(f => hasDecimal(f.dataType))
      if (bad.isEmpty) None else Some(s"$name: ${bad.map(_.name).mkString(",")}")
    }
    assert(offenders.isEmpty,
      s"published DecimalType columns (hash-unstable in the driver gate): ${offenders.mkString("; ")}")
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
