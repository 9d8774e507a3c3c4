package graft
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    spark.range(100000L).selectExpr("sum(id)").collect()
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("d9_dedup_clusters")(spark, d).count()
      println(f"[prof] d9 run$i ${(System.nanoTime()-t0)/1e9}%.1f s rows=$n")
    }
    spark.stop()
  }
}
