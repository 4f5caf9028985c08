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

  /** x254's salt fan-out, shared with the spec. */
  val AuditSalts: Int = 8

  /** Salted-join equivalence audit (x254): the real lineitem⋈orders
    * revenue rollup routed through [[saltedEquiJoin]] — the oracle is
    * the PLAIN SQL join, so a hash match proves the salt-and-replicate
    * rewrite (each fact row salted by its own content, the build side
    * replicated [[AuditSalts]]×, join on (key, salt)) changes no
    * answers on real data, not just the toy spec fixture. The
    * `n_orders` distinct count rides through the rewrite too (each
    * order key appears under several salts — dedup must still work).
    *
    * 100 TB shape: this is the manual fallback for a hot-key shuffle
    * join AQE can't split; cost = build×salts replication, paid only
    * when |build| ≪ |fact|/salts. */
  def saltedJoinAudit(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val fact = graft.Tables.lineitem(spark, dir).select(
      col("l_orderkey").as("k"),
      Relational.cents(col("l_extendedprice")).as("cents"))
    val dim = graft.Tables.orders(spark, dir).select(
      col("o_orderkey").as("k"), col("o_orderpriority").as("prio"))
    saltedEquiJoin(fact, dim, "k", salts = AuditSalts)
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("rev_cents"),
        countDistinct(col("k")).as("n_orders"))
  }
}
