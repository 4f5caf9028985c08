package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Dataset[T]` facade over the testdata (SURVEY.md §1.4: the
  * reference is untyped row-level PySpark; the Scala-idiomatic API adds
  * compile-time field checks where a case class models the row).
  *
  * Also hosts a typed custom aggregate (`Aggregator`) — the user-facing
  * tier of custom aggregation under Spark's preference order (§7.3),
  * before dropping to TypedImperativeAggregate/DeclarativeAggregate.
  */
object TypedTables {

  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
                      l_discount: Double, l_tax: Double, l_returnflag: String,
                      l_linestatus: String, l_shipdate: java.sql.Timestamp)

  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                   o_totalprice: Double, o_orderdate: java.sql.Timestamp,
                   o_orderpriority: String)

  case class Document(doc_id: Long, text: String, lang: String, source: String,
                      n_chars: Long)

  def lineitem(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Tables.lineitem(spark, dir).as[Lineitem]
  }

  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    Tables.orders(spark, dir).as[Order]
  }

  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.documents(spark, dir).as[Document]
  }

  /** Typed revenue aggregate in exact integer cents — same numeric
    * discipline as the untyped surface (operators/Relational.scala). */
  case class RevenueStats(nItems: Long, revenueCents: Long)

  object RevenueAgg extends Aggregator[Lineitem, RevenueStats, RevenueStats] {
    override def zero: RevenueStats = RevenueStats(0L, 0L)
    override def reduce(b: RevenueStats, a: Lineitem): RevenueStats =
      RevenueStats(b.nItems + 1, b.revenueCents + math.round(a.l_extendedprice * 100))
    override def merge(x: RevenueStats, y: RevenueStats): RevenueStats =
      RevenueStats(x.nItems + y.nItems, x.revenueCents + y.revenueCents)
    override def finish(r: RevenueStats): RevenueStats = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[RevenueStats] =
      org.apache.spark.sql.Encoders.product[RevenueStats]
    override def outputEncoder: org.apache.spark.sql.Encoder[RevenueStats] =
      org.apache.spark.sql.Encoders.product[RevenueStats]
  }

  /** groupByKey + typed Aggregator: revenue per return flag. */
  def revenueByFlag(ds: Dataset[Lineitem]): Dataset[(String, RevenueStats)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.l_returnflag).agg(RevenueAgg.toColumn)
  }
}
