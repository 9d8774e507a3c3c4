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
  * table so the plan doesn't grow exponentially with k.
  */
object Bpe {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The shared front half: corpus → (rep, cnt) word-TYPE table with
    * space-separated single-char symbols.
    *
    * "(?!^)(?!$)" splits between every pair of chars with NO leading or
    * trailing empty token — the JVM-side twin of string_split(w, '').
    * The $ guard matters: Spark's split keeps trailing empties
    * (limit -1), so a bare "(?!^)" emits a phantom "" symbol per word,
    * and the (last-char, "") pair — weighted by every word's frequency —
    * can outrank the true top pair and produce a malformed rank-1 merge
    * with empty sym_b (regression pinned in BpeSpec: "as bs cs"
    * corpus). */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(col("w").rlike("^[!-~]+$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(concat_ws(" ", split(col("w"), "(?!^)(?!$)")).as("rep"),
        col("cnt"))
      .localCheckpoint(eager = false)

  /** Adjacent-symbol pair counts over a (rep, cnt) word table — one
    * map-side-combinable hash aggregate at pair grain. */
  private def pairCounts(reps: DataFrame): DataFrame = {
    val t = split(col("rep"), " ")
    reps
      .select(col("cnt"), explode(zip_with(
        slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b))).as("pair"))
      .groupBy("pair").agg(sum(col("cnt")).as("pair_count"))
  }

  private def doubled(c: Column): Column = replace(c, lit(" "), lit("  "))

  /** One greedy leftmost-non-overlapping application of merge (a, b) to
    * a DOUBLED-separator rep framed by single spaces: ` a  b ` → ` ab `.
    * Composable: with symbol-DISJOINT merges, chaining these between one
    * doubling and one collapse applies all of them simultaneously — a
    * replaced region re-emits a single boundary space on each side, and
    * a disjoint neighbour pattern needs its own INTERNAL double space
    * (untouched) plus ≥1 boundary space, so every true occurrence still
    * matches and no false adjacency can appear (merges concatenate
    * symbols, never delete them). */
  private def applyMerge(rep: Column, a: Column, b: Column): Column =
    replace(rep,
      concat(lit(" "), a, lit("  "), b, lit(" ")),
      concat(lit(" "), a, b, lit(" ")))

  /** Learn the top-`k` merges; returns one row per merge:
    * (merge_rank, sym_a, sym_b, pair_count).
    *
    * SCALE BOUND — the iteration axis, stated honestly: the corpus axis
    * is solved by the word-type collapse, but the k merges are k
    * strictly SERIAL driver-sequenced rounds (pair count → argmax →
    * rewrite), a fixed handful of Spark jobs each over the bounded
    * vocab table. Per-merge cost is flat in k (measured: the
    * `t28_bpe_k_axis` ScaleHeadroom leg at k=4/16/64), so a
    * production-size merge table (k ≈ 30 000, cf. GPT-2's 50k) is
    * wall-clock-bound by ROUND COUNT × fixed job latency, not by data.
    * That is exactly the axis [[learnMergesBatched]] compresses. */
  def learnMerges(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var reps = wordTable(docs, textCol)
    var out: DataFrame = null
    for (rank <- 1 to k) {
      val best = pairCounts(reps)
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
            applyMerge(
              concat(lit(" "), doubled(col("rep")), lit(" ")),
              col("sym_a"), col("sym_b")),
            lit("  "), lit(" "))))
          .select(col("rep"), col("cnt"))
          .localCheckpoint(eager = false)
      }
    }
    out
  }

  /** Batched BPE merge learning — the iteration-axis mitigation
    * (standard distributed-tokenizer practice, cf. the batching in
    * SentencePiece-style trainers): per rewrite round, accept up to
    * `maxBatch` merges whose CONFLICT SETS — the pair's two sides plus
    * the symbol the merge mints (a+b) — are pairwise disjoint, apply
    * them all in one projection, and recount once. That disjointness
    * makes the batch order-free: applying (a,b) cannot create, destroy,
    * or recount any occurrence of (c,d) when neither side nor the
    * minted symbol is shared (merges only concatenate adjacent symbols,
    * and a pair consuming a symbol another batch member MINTS — e.g.
    * ("a","b") with ("ab","x") — is excluded), so the simultaneous
    * application equals applying the batch serially in any order
    * against the SAME pre-round counts. What batching changes vs
    * [[learnMerges]] is the STATISTIC freshness: ranks 2..B of a round
    * use counts from before rank 1's application, so a merged symbol
    * (ab) cannot be extended again until the next round — the
    * documented deviation every batched trainer accepts in exchange
    * for ~k/B rounds instead of k. `maxBatch = 1` is EXACTLY
    * [[learnMerges]] (spec-pinned).
    *
    * Selection is greedy over the (count desc, pair asc) order — the
    * serial tie-break — restricted to a driver-collected shortlist of
    * the top 4×maxBatch pairs (bounded, the e17 shortlist precedent:
    * selection state is inherently sequential, so it runs on a BOUNDED
    * frame, never the corpus). A round accepts fewer than `maxBatch`
    * merges only when conflicts exhaust the shortlist — correctness is
    * unaffected, the next round re-counts anyway.
    *
    * Returns (merge_rank, sym_a, sym_b, pair_count, pass): global rank
    * in acceptance order, `pass` = the rewrite round that learned it —
    * `max(pass) ≈ k/maxBatch` is the measured round-count collapse. */
  def learnMergesBatched(docs: DataFrame, textCol: String, k: Int,
      maxBatch: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxBatch >= 1, s"maxBatch must be >= 1, got $maxBatch")
    val spark = docs.sparkSession
    import spark.implicits._
    var reps = wordTable(docs, textCol)
    val accepted = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long, Int)]
    var pass = 0
    while (accepted.size < k) {
      pass += 1
      val want = k - accepted.size
      // bounded shortlist: TakeOrderedAndProject of 4×maxBatch rows
      val shortlist = pairCounts(reps)
        .orderBy(col("pair_count").desc, col("pair").asc)
        .limit(4 * math.min(maxBatch, want))
        .select(split(col("pair"), " ")(0).as("sym_a"),
          split(col("pair"), " ")(1).as("sym_b"), col("pair_count"))
        .as[(String, String, Long)].collect()
      if (shortlist.isEmpty)
        // vocabulary exhausted (every word is one symbol) — stop early
        return toFrame(spark, accepted.toSeq)
      // conflict set holds each accepted pair's sides AND its merged
      // symbol: a later pair reading OR producing any of them would be
      // order-dependent — e.g. ("a","b") + ("ab","x") in one batch
      // merges "a b x" to "abx" or leaves it at "ab x" depending on
      // application order, because the first merge MINTS the symbol
      // the second one consumes
      val used = scala.collection.mutable.Set.empty[String]
      val batch = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Long)]
      for ((a, b, c) <- shortlist
           if batch.size < math.min(maxBatch, want)
           if !used(a) && !used(b) && !used(a + b)) {
        used += a; used += b; used += (a + b)
        batch += ((a, b, c))
      }
      // observability for the k/B round-collapse claim: a pass that
      // accepts fewer merges than it wanted (conflicts exhausted the
      // bounded shortlist — pathological shared-symbol corpora) silently
      // degrades toward serial round counts; surface it so the
      // degradation is measurable when it happens
      if (batch.size < math.min(maxBatch, want))
        log.warn(s"BPE batched pass $pass accepted ${batch.size} of " +
          s"${math.min(maxBatch, want)} wanted merges " +
          s"(shortlist ${shortlist.length}, conflicts exhausted it); " +
          "round count degrades toward serial for this corpus")
      for ((a, b, c) <- batch)
        accepted += ((accepted.size + 1, a, b, c, pass))
      if (accepted.size < k) {
        // one projection applies the whole (order-free) batch
        val applied = batch.foldLeft(
          concat(lit(" "), doubled(col("rep")), lit(" "))) {
          case (rep, (a, b, _)) => applyMerge(rep, lit(a), lit(b))
        }
        reps = reps
          .withColumn("rep", trim(replace(applied, lit("  "), lit(" "))))
          .select(col("rep"), col("cnt"))
          .localCheckpoint(eager = false)
      }
    }
    toFrame(spark, accepted.toSeq)
  }

  private def toFrame(spark: org.apache.spark.sql.SparkSession,
      rows: Seq[(Int, String, String, Long, Int)]): DataFrame = {
    import spark.implicits._
    rows.toDF("merge_rank", "sym_a", "sym_b", "pair_count", "pass")
  }

  /** APPLY a learned merge table to a corpus — the tokenizer-apply side
    * completing [[learnMerges]]' train side (t19's regex count is the
    * heuristic stand-in; this is the real thing). Per doc: ASCII-word
    * count, BPE token count after applying all `merges` in rank order,
    * and the character mass those words carry (`n_bpe_tokens` ≤
    * `n_chars_ascii`; their ratio is the compression the learned vocab
    * buys — the number a tokenizer ablation reads).
    *
    * Scale shape — the apply-side Zipf collapse: the merge chain (one
    * codegen'd projection of 3k string ops, merges inlined as literals —
    * they are k rows by construction, the e17 bounded-collect rule)
    * runs at VOCAB grain, never on the corpus; the corpus pays one
    * tokenize pass and one word equi-join against the segmented vocab
    * (broadcastable while the vocab is small, a plain hash join on the
    * word key beyond — uniform by construction, words ARE the key).
    * Application is sequential in rank order with re-doubling per step,
    * exactly [[learnMerges]]' training-time semantics, so train-then-
    * apply round-trips: segmenting the training corpus with its own
    * merges reproduces the final training state. Docs with no ASCII
    * word emit nothing (nothing is tokenizable), mirrored by the
    * oracle. */
  def applyMerges(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(col("w").rlike("^[!-~]+$"))
      // barrier: the vocab aggregate and the join probe both read it
      .localCheckpoint(eager = false)
    val rep0 = concat_ws(" ", split(col("w"), "(?!^)(?!$)"))
    val repN = merges.foldLeft(rep0) { case (rep, (a, b)) =>
      trim(replace(
        applyMerge(concat(lit(" "), doubled(rep), lit(" ")), lit(a), lit(b)),
        lit("  "), lit(" ")))
    }
    val vocab = words.select("w").distinct()
      .select(col("w"), size(split(repN, " ")).cast("long").as("__n_sym"),
        length(col("w")).cast("long").as("__n_chr"))
    words.join(vocab, Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__n_sym")).as("n_bpe_tokens"),
        sum(col("__n_chr")).as("n_chars_ascii"))
  }
}
