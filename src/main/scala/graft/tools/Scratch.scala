package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.1")
    def time(tag: String)(f: => Long): Unit = {
      val r = (1 to 3).map { _ => val t0=System.nanoTime(); val n=f; (System.nanoTime()-t0)/1e9 }
      println(f"SCRATCH $tag ${r.min}%.3f s")
    }
    val keys = Seq("l_orderkey"); 
    val valueCols = li.columns.filterNot(keys.contains).toSeq
    val order = Seq("l_linenumber", "l_quantity", "l_extendedprice", "l_partkey", "l_suppkey")
    val ordCols = (order ++ valueCols.filterNot(order.contains)).distinct
    time("min_by_struct") {
      li.groupBy(keys.map(col): _*)
        .agg(min_by(struct(valueCols.map(col): _*), struct(ordCols.map(col): _*)).as("__r"))
        .count()
    }
    time("window_rn") {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(ordCols.map(col): _*)
      li.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).count()
    }
    time("plain_count_groups") { li.groupBy(keys.map(col): _*).agg(count(lit(1))).count() }
    spark.stop()
  }
}
