package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.udaf

/** SQL-surface registration for the engine's custom functions, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works alongside the
  * Column API. `register` wires an existing session (tests, notebooks);
  * cluster deployments set
  * `spark.sql.extensions=graft.functions.GraftExtensions` instead. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_size",
      (exprs: Seq[Expression]) => SortedIntersectSize(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      (exprs: Seq[Expression]) => NfcNormalize(exprs(0)),
      "built-in")
    spark.udf.register("top_k_3", udaf(new TopKAggregator(3)))
  }
}

/** `SparkSessionExtensions` hook: injects the native EXPRESSION functions
  * at session build time (`--conf spark.sql.extensions=...`). The udaf
  * (`top_k_3`) is an `Aggregator`, which the extensions API cannot
  * inject — sessions needing it in SQL call [[GraftFunctions.register]]
  * once after session build. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("sorted_intersect_size"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (exprs: Seq[Expression]) => SortedIntersectSize(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_normalize"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs(0))))
  }
}
