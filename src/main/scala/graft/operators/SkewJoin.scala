package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for shuffle joins — the explicit fallback when a
  * hot key overwhelms one reducer and AQE's runtime skew-split (which we
  * leave ON) can't help, e.g. for non-sort-merge plans or pre-AQE engines.
  *
  * Fact rows get a deterministic salt in [0, salts); the build side is
  * replicated once per salt value. Join on (key, salt) spreads each hot key
  * over `salts` reducers; the joined result is provably identical to the
  * unsalted join (salt values match by construction). Cost: build side
  * × salts — use only when |build| ≪ |fact| / salts.
  */
object SkewJoin {

  /** Deterministic row salt from the row's own columns (no RNG state). */
  def salt(cols: Seq[Column], salts: Int): Column =
    pmod(xxhash64(cols: _*), lit(salts))

  def saltedEquiJoin(fact: DataFrame, build: DataFrame, key: String,
                     salts: Int, joinType: String = "inner",
                     saltCols: Seq[String] = Nil): DataFrame = {
    val saltSource = if (saltCols.nonEmpty) saltCols else fact.columns.toSeq
    val saltedFact = fact.withColumn("__salt", salt(saltSource.map(fact(_)), salts))
    val replicatedBuild = build.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(replicatedBuild, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
