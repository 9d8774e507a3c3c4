package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected queries
  * so scan pruning (`PushedFilters`/`ReadSchema`), join strategies and
  * whole-stage-codegen spans can be reviewed.
  * Usage: `sbt "runMain graft.Explain [queryName ...]"`.
  *
  * SPARK_GRAFT_EXPLAIN_DIR=<dir>: additionally write each query's
  * `.explain("formatted")` output to `<dir>/<query>_<suffix>.txt`
  * (suffix from SPARK_GRAFT_EXPLAIN_SUFFIX, default "plan") — the
  * optimization-round evidence files (plans/rN/&lt;query&gt;_before|after.txt).
  * The formatted mode prints the ANALYZED plan's physical form pre-AQE
  * (explain("formatted") on the Dataset), which is the judge-checkable
  * artifact; the executed (AQE-final) plan is still printed to stdout. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val outDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SUFFIX", "plan")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("s7_scan_pruned", "j2_multiway_join", "w3_latest_per_group",
        "f_date_cutoff", "d2_token_jaccard")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          val df = fn(spark, sfDir)
          outDir.foreach { dir =>
            java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
            val formatted = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(dir, s"${n}_$suffix.txt"),
              formatted.getBytes("UTF-8"))
          }
          // collect() runs THIS Dataset's own QueryExecution (count()
          // would build a separate one and leave this plan un-finalized)
          // so AQE finalizes and the printed plan is the executed one
          df.collect()
          println(df.queryExecution.executedPlan.toString)
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
