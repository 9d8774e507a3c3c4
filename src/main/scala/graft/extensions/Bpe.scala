package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning (Sennrich et al. 2016) — the tokenizer-
  * TRAINING side of the pipeline (t19/bpeishTokenCount is the apply-side
  * stand-in). Word-internal BPE over the corpus:
  *
  *   1. collapse the corpus to the distinct-WORD table with frequencies —
  *      the Zipf collapse that makes tokenizer training feasible at
  *      100 TB: pair statistics live at word-TYPE grain (≪ corpus
  *      tokens), and every later iteration touches only that bounded
  *      table, never the corpus again;
  *   2. per iteration: adjacent-symbol pair counts (one hash aggregate,
  *      map-side combinable, weighted by word frequency), argmax with a
  *      deterministic (count desc, pair asc) tie-break — a 1-row frame
  *      attached back by broadcast (the engine's scalar-attach pattern,
  *      F4) — then greedy leftmost-non-overlapping merge application.
  *
  * Merge application uses the double-separator replace trick: symbols are
  * single-space-joined; doubling the separators first makes ` a  b ` →
  * ` ab ` leftmost-non-overlapping replacement merge CONSECUTIVE pair
  * occurrences (`a b a b` → `ab ab`) while staying greedy on overlaps
  * (`a a a` → `aa a`) — plain non-regex `replace`, identical semantics in
  * Spark codegen and the DuckDB oracle. The alphabet is restricted to
  * printable-ASCII words so char segmentation is engine-portable (JVM
  * UTF-16 `split` vs DuckDB UTF-8 `string_split` disagree only beyond
  * ASCII).
  *
  * Like Graph.Run, each iteration lazily checkpoints the (bounded) word
  * table so the plan doesn't grow exponentially with k; k is small by
  * construction (vocab work per merge is one aggregate + one narrow map).
  */
object Bpe {

  /** Learn the top-`k` merges; returns one row per merge:
    * (merge_rank, sym_a, sym_b, pair_count). */
  def learnMerges(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(col("w").rlike("^[!-~]+$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      // "(?!^)(?!$)" splits between every pair of chars with NO leading
      // or trailing empty token — the JVM-side twin of
      // string_split(w, ''). The $ guard matters: Spark's split keeps
      // trailing empties (limit -1), so a bare "(?!^)" emits a phantom
      // "" symbol per word, and the (last-char, "") pair — weighted by
      // every word's frequency — can outrank the true top pair and
      // produce a malformed rank-1 merge with empty sym_b (regression
      // pinned in BpeSpec: "as bs cs" corpus).
      .select(concat_ws(" ", split(col("w"), "(?!^)(?!$)")).as("rep"),
        col("cnt"))
      .localCheckpoint(eager = false)

    def doubled(c: Column): Column = replace(c, lit(" "), lit("  "))

    var reps = words
    var out: DataFrame = null
    for (rank <- 1 to k) {
      val t = split(col("rep"), " ")
      val pairs = reps
        .select(col("cnt"), explode(zip_with(
          slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
          (a, b) => concat(a, lit(" "), b))).as("pair"))
        .groupBy("pair").agg(sum(col("cnt")).as("pair_count"))
      val best = pairs
        .orderBy(col("pair_count").desc, col("pair").asc).limit(1)
        .select(split(col("pair"), " ")(0).as("sym_a"),
          split(col("pair"), " ")(1).as("sym_b"), col("pair_count"))
        .localCheckpoint(eager = false) // 1 row, read by output AND apply
      val row = best.select(lit(rank).as("merge_rank"), col("sym_a"),
        col("sym_b"), col("pair_count"))
      out = if (out == null) row else out.unionByName(row)
      if (rank < k) {
        reps = reps
          .crossJoin(broadcast(best.select(col("sym_a"), col("sym_b"))))
          .withColumn("rep", trim(replace(
            replace(
              concat(lit(" "), doubled(col("rep")), lit(" ")),
              concat(lit(" "), col("sym_a"), lit("  "), col("sym_b"),
                lit(" ")),
              concat(lit(" "), col("sym_a"), col("sym_b"), lit(" "))),
            lit("  "), lit(" "))))
          .select(col("rep"), col("cnt"))
          .localCheckpoint(eager = false)
      }
    }
    out
  }
}
