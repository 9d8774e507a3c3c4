package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the published pretraining-data recipe
  * shape (heuristic quality rules → exact dedup → benchmark
  * decontamination; cf. Gopher/MassiveText (Rae et al. 2021, §A1) and
  * the open-data reproductions of that recipe) composed as ONE
  * declarative Catalyst plan instead of three materialized passes.
  *
  * Emits EVERY input doc with its fate — `status ∈ {low_quality,
  * exact_dup, contaminated, kept}` — the audit-log form real pipelines
  * keep (per-stage filter rates are the first thing a data engineer
  * inspects); the curated corpus is the `status = 'kept'` slice.
  * Precedence mirrors stage order: a doc failing quality is never
  * charged to dedup; a non-keeper duplicate is never charged to
  * decontamination (its keeper carries that verdict).
  *
  * Scale shape at 100 TB: one narrow codegen'd signal pass over the scan
  * (token array projected once, all signals read it) behind a lazy
  * checkpoint barrier; ONE exchange of (id, 16-byte fingerprint) grain
  * for the keeper election — never the text; and a broadcast semi-join
  * probe of the bounded benchmark shingle set. No all-pairs, no
  * driver-side state, no shuffle of document text at all — the widest
  * shuffled row is (id, fingerprint, signals).
  */
object Curation {

  /** Curate `corpus` against held-out `bench` docs. Quality predicate =
    * the engine's t9 contract (English by stopword argmax, composite
    * score ≥ 0.5, 20–1000 tokens, ≤ 0.3 repeated-3-gram ratio); dedup =
    * exact normalized-text fingerprint keeping the min id; contamination
    * = any shared word `ngram` with `bench`. */
  def curate(corpus: DataFrame, bench: DataFrame, textCol: String,
      idCol: String, nCharsCol: String, ngram: Int = 8): DataFrame = {
    val id = col(idCol)
    val sig = corpus
      .withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      .select(id, col(textCol),
        TextAnalysis.normHash(col(textCol)).as("__fp"),
        size(col("__toks")).cast("long").as("n_tokens"),
        TextAnalysis.langIdFromTokens(col("__toks")).as("__lang"),
        TextAnalysis.qualityScoreFromTokens(col("__toks"), col(nCharsCol))
          .as("__q"),
        TextAnalysis.dupNgramRatioFromTokens(col("__toks"), 3).as("__dup3"))
      // Pushdown barrier (the t9 contract): without it Catalyst pushes
      // the downstream filters through this projection and re-evaluates
      // the heavy signal expressions once per consuming branch.
      .localCheckpoint(eager = false)
    val flagged = sig.withColumn("__quality_ok",
      col("__lang") === "en" && col("__q") >= 0.5 &&
        col("n_tokens").between(20, 1000) && col("__dup3") <= 0.3)
    val keepers = flagged.filter(col("__quality_ok"))
      .groupBy(col("__fp")).agg(min(id).as("__keep_id"))
    // Contamination probes ONLY the keeper slice: a non-keeper
    // duplicate's fate is `exact_dup` by precedence no matter what the
    // probe would say, and its text is byte-identical to its keeper's —
    // shingling it is pure waste at scale. The semi-join is (id)-grain;
    // the shingle explode it avoids is (id × tokens)-grain.
    val keeperSlice = flagged.filter(col("__quality_ok"))
      .join(keepers.select(col("__keep_id").as(idCol)), Seq(idCol),
        "left_semi")
    val contaminated = Dedup.contaminatedIdsNgram(
        keeperSlice, bench, textCol, idCol, ngram)
      .withColumn("__contaminated", lit(true))
    flagged
      .join(keepers, Seq("__fp"), "left")
      .join(contaminated, Seq(idCol), "left")
      .select(id,
        when(!col("__quality_ok"), lit("low_quality"))
          .when(id =!= col("__keep_id"), lit("exact_dup"))
          .when(col("__contaminated"), lit("contaminated"))
          .otherwise(lit("kept")).as("status"),
        col("n_tokens"))
  }
}
