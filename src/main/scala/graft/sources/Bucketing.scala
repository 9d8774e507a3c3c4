package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table layout: pre-shuffle a table ONCE at write time
  * (`bucketBy(n, key)` + `sortBy`) so every later join or aggregation on
  * that key runs with ZERO exchange — the shuffle is amortized across
  * all downstream consumers. This is the 100 TB answer to "the same
  * fact-dim join runs in every pipeline stage": at scale the join's
  * shuffle dominates, and bucketing moves it into the (already
  * necessary) write.
  *
  * Both sides must agree on bucket count and key; Spark's
  * FileSourceScanExec then reports `SelectedBucketsCount` and the join
  * plans with no ShuffleExchange (asserted in PlanSpec). The `merge`
  * hint keeps the demonstration honest — without it AQE would broadcast
  * the small side and trivially skip the exchange.
  */
object Bucketing {

  val BucketCount = 8

  /** Write customer + orders bucketed by custkey into the session
    * catalog, then join the bucketed tables shuffle-free. */
  def bucketedCustomerOrders(spark: SparkSession, dir: String): DataFrame = {
    // the catalog is per-session but the warehouse directory is not: a
    // fresh session with a stale location refuses saveAsTable, so drop
    // both the entry AND the files before (re)writing
    Seq("graft_cust_b", "graft_ord_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .write.bucketBy(BucketCount, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("graft_cust_b")
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .write.bucketBy(BucketCount, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("graft_ord_b")
    spark.table("graft_cust_b").hint("merge")
      .join(spark.table("graft_ord_b"),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"))
  }
}
