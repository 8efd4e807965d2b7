package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.TextFunctions

/** Corpus drift / domain-divergence measurement — "how far is this
  * domain (or crawl slice, or day) from the corpus it feeds": KL
  * divergence of each group's unigram distribution from the whole
  * corpus's, the standard monitor for training-mix shift (a domain
  * whose KL jumps between snapshots changed its content mix).
  *
  *   KL(P_k ‖ Q) = Σ_t p_{k,t} · ln(p_{k,t} / q_t)
  *
  * with add-one smoothing on the group side (groups have zeros; the
  * corpus, whose vocabulary defines the support, does not):
  * p = (c + 1)/(n_k + V), q = c_t / N.
  *
  * Scale shape: ONE (key, token) count shuffle; the corpus table
  * re-aggregates from it narrowly; the evaluation grid is
  * vocab × keys — keys (domains/slices) are FEW by contract, so the
  * grid is a broadcast cross of the V-row corpus frame, never
  * corpus-sized. Totals ride a broadcast join of a keys-row frame.
  *
  * Determinism (oracle parity): p and q are correctly-rounded doubles
  * of exact integer ratios; each ln-derived term is rounded to
  * decimal(18,9) BEFORE the order-free decimal sum (the BM25/nDCG
  * pattern — STATUS "determinism lessons" #4).
  */
object Drift {

  /** Per-key unigram KL from the corpus distribution over `textCol`
    * tokens (whitespace tokens, [[TextFunctions.tokens]]). Returns
    * (keyCol, n_tokens, vocab_used, kl) — `n_tokens` the key's token
    * count, `vocab_used` its distinct tokens, `kl` in nats. Null keys
    * count as a group; null texts contribute nothing. */
  def unigramKl(df: DataFrame, keyCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(keyCol).as("__k"),
      explode(TextFunctions.tokens(col(textCol))).as("__t"))
    val counts = toks.groupBy("__k", "__t")
      .agg(count(lit(1)).cast("long").as("__c"))
    // narrow re-aggregations of the one shuffled frame
    val corpus = counts.groupBy("__t")
      .agg(sum("__c").cast("long").as("__ct"))
    val keyTotals = counts.groupBy("__k")
      .agg(sum("__c").cast("long").as("__nk"),
        count(lit(1)).cast("long").as("__vk"))
    val scalars = corpus.agg(sum("__ct").cast("long").as("__n"),
      count(lit(1)).cast("long").as("__val"))
    // grid = vocab × keys (keys are few by contract) with the
    // corpus-wide scalars riding along. The counts join must be
    // NULL-SAFE on the key: a null key is a legitimate group
    // (groupBy made it one) and an equi-join would silently zero its
    // observed counts.
    val cnts = counts.select(col("__k").as("__ck"), col("__t").as("__ct2"),
      col("__c"))
    val grid = corpus.crossJoin(broadcast(keyTotals))
      .crossJoin(broadcast(scalars))
      .join(cnts,
        col("__k") <=> col("__ck") && col("__t") === col("__ct2"), "left")
      .drop("__ck", "__ct2")
      .na.fill(0L, Seq("__c"))
    val p = (col("__c") + lit(1L)).cast("double") /
      (col("__nk") + col("__val")).cast("double")
    val q = col("__ct").cast("double") / col("__n").cast("double")
    val term = round(p * log(p / q), 9).cast("decimal(18,9)")
    grid.withColumn("__term", term)
      .groupBy("__k")
      .agg(first("__nk").as("n_tokens"), first("__vk").as("vocab_used"),
        sum("__term").cast("string").cast("double").as("kl"))
      .withColumnRenamed("__k", keyCol)
  }

  /** Population Stability Index between a REFERENCE slice and a
    * CURRENT slice of a numeric column — the ML-ops drift staple
    * ("did the feature distribution move since training"): bin edges
    * are the reference slice's `bins`-quantile cut points
    * ([[Profile.ntileExact]] under a (value, id) total order — never
    * a global ntile window), both slices are counted per bin, and
    * each bin reports its Laplace-smoothed proportions and PSI term
    * `(p − q)·ln(p/q)`. Σ terms < 0.1 is the classic "stable" read.
    * Returns (bin, edge, n_ref, n_cur, p_ref, p_cur, psi_term),
    * per-bin — no cross-engine double sum; terms quantize at scale 9.
    *
    * Scale shape: one ntileExact pass over the reference; the
    * ≤`bins`-row edge table collects to the driver (bins is small by
    * contract — this makes the operator EAGER at call time) and the
    * current slice is binned by a pure CASE-chain projection — no
    * row fan-out, no per-row-id shuffle; the only exchange over the
    * current slice is the partial-aggregated ≤`bins`-key count. */
  def psi(ref: DataFrame, cur: DataFrame, valCol: String,
      idCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val r = ref.where(col(valCol).isNotNull)
      .select(col(idCol).as("__id"), col(valCol).as("__val"))
    val c = cur.where(col(valCol).isNotNull)
      .select(col(idCol).as("__id"), col(valCol).as("__val"))
    val tiled = Profile.ntileExact(r,
      Seq(col("__val").asc, col("__id").asc), bins, "__bin",
      materialize = false)
    // ONE ref-side stats pass, collected: per-tile max (the bin
    // edge — the top tile's edge is +inf conceptually; current
    // values above it clamp into the top bin) and per-tile count.
    // ≤ bins rows by construction, so driver-side is free, and the
    // ntileExact lineage executes ONCE instead of once per consumer
    // (edges, counts, and the reference total all derive from it).
    val refStats = tiled.groupBy("__bin")
      .agg(max("__val").as("__edge"), count(lit(1)).as("n_ref"))
      .orderBy("__bin").collect()
    // current-side binning as a pure projection: ascending-edge CASE
    // chain ≡ min bin with __val <= edge (first match wins), values
    // above every edge (and the empty-reference corner) clamp to bin
    // `bins` — exactly the semantics the old inequality-join +
    // min-per-id form had, with zero added shuffles
    val binCase = refStats.map(row => (row.getLong(0), row.get(1)))
      .foldRight(lit(bins.toLong): Column) {
        case ((b, e), rest) =>
          when(col("__val") <= lit(e), lit(b)).otherwise(rest)
      }
    // ≤ bins rows after the one partial-aggregated count shuffle;
    // pinned so its two consumers (the join and the Σ n_cur total)
    // don't rescan the current slice
    val curBinned = c.withColumn("__bin", binCase)
      .groupBy("__bin").agg(count(lit(1)).as("n_cur"))
      .localCheckpoint()
    // ref side re-enters as a LITERAL frame (it was just collected);
    // totals derive from the per-bin counts (every row lands in
    // exactly one bin) instead of re-scanning either slice. The edge
    // values were collected from the REF side, so the literal schema
    // must carry the ref side's type — typing them with the cur
    // side's would mis-encode (or crash createDataFrame) whenever the
    // two slices' value types differ (int ref vs long cur).
    val valType = r.schema("__val").dataType
    val refLit = r.sparkSession.createDataFrame(
      java.util.Arrays.asList(refStats: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__bin",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("__edge", valType),
        org.apache.spark.sql.types.StructField("n_ref",
          org.apache.spark.sql.types.LongType))))
    // coalesce: an empty slice must total 0 (the old count(*) form),
    // not a null that would poison every smoothed proportion
    val nR = broadcast(refLit.agg(
      coalesce(sum("n_ref"), lit(0L)).cast("long").as("__nr")))
    val nC = broadcast(curBinned.agg(
      coalesce(sum("n_cur"), lit(0L)).cast("long").as("__nc")))
    refLit.join(curBinned, Seq("__bin"), "full_outer")
      .select(col("__bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        col("__edge"))
      .crossJoin(nR).crossJoin(nC)
      .withColumn("p_ref",
        ((col("n_ref").cast("double") + 0.5) /
          (col("__nr").cast("double") + 0.5 * bins))
          .cast("decimal(18,9)").cast("double"))
      .withColumn("p_cur",
        ((col("n_cur").cast("double") + 0.5) /
          (col("__nc").cast("double") + 0.5 * bins))
          .cast("decimal(18,9)").cast("double"))
      .withColumn("psi_term",
        ((col("p_ref") - col("p_cur")) * log(col("p_ref") / col("p_cur")))
          .cast("decimal(18,9)").cast("double"))
      .select(col("__bin").as("bin"), col("__edge").as("edge"),
        col("n_ref"), col("n_cur"), col("p_ref"), col("p_cur"),
        col("psi_term"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between a REFERENCE and
    * a CURRENT slice of a numeric column: `D = max_x |F_ref(x) −
    * F_cur(x)|`, the binning-free companion to [[psi]] (PSI answers
    * "how much did the distribution move per decile", KS answers "is
    * the largest CDF gap big" without choosing bins — the classic
    * pre-deploy feature-drift test). The sup of two step functions is
    * attained at an observed value, so evaluating at every DISTINCT
    * value is exact, not an approximation. Returns ONE row:
    * (n_ref, n_cur, d_stat, at_value) with `at_value` the SMALLEST
    * value attaining the max (deterministic argmax); empty if either
    * slice is empty (KS is undefined, not zero).
    *
    * Determinism: cumulative counts are exact longs; each CDF is one
    * double division bridged to decimal(18,9), and D re-bridges the
    * difference — engine-replayable.
    *
    * Scale shape: one (value, side) count shuffle → per-value count
    * rows (bounded by DISTINCT values, not rows), materialized once;
    * two range-partitioned [[PrefixScan.runningSumBy]] passes for the
    * cumulative counts (never a global window); one TakeOrdered(1)
    * argmax. */
  def ksStat(ref: DataFrame, cur: DataFrame, valCol: String): DataFrame = {
    val r = ref.where(col(valCol).isNotNull)
      .select(col(valCol).as("__x"), lit(1L).as("__r"), lit(0L).as("__c"))
    val c = cur.where(col(valCol).isNotNull)
      .select(col(valCol).as("__x"), lit(0L).as("__r"), lit(1L).as("__c"))
    val counts = r.unionByName(c).groupBy("__x")
      .agg(sum("__r").as("__nr"), sum("__c").as("__nc"))
      .localCheckpoint() // base for two prefix passes + the totals
    val cum = PrefixScan.runningSumBy(
      PrefixScan.runningSumBy(counts, Seq(col("__x").asc), "__nr",
        "__cumr", materialize = false),
      Seq(col("__x").asc), "__nc", "__cumc", materialize = false)
    val tot = broadcast(counts.agg(
      sum("__nr").cast("long").as("__tr"),
      sum("__nc").cast("long").as("__tc")))
    def bridge(e: Column): Column =
      e.cast("decimal(18,9)").cast("string").cast("double")
    cum.crossJoin(tot)
      .where(col("__tr") > 0L && col("__tc") > 0L)
      .withColumn("__fr",
        bridge(col("__cumr").cast("double") / col("__tr").cast("double")))
      .withColumn("__fc",
        bridge(col("__cumc").cast("double") / col("__tc").cast("double")))
      .withColumn("__d", bridge(abs(col("__fr") - col("__fc"))))
      .orderBy(col("__d").desc, col("__x").asc)
      .limit(1)
      .select(col("__tr").as("n_ref"), col("__tc").as("n_cur"),
        col("__d").as("d_stat"), col("__x").as("at_value"))
  }

  /** Categorical drift: one-sample chi-squared of the CURRENT slice's
    * category counts against the REFERENCE slice's proportions — the
    * companion test for DISCRETE mix columns (language, source,
    * license, format) where [[psi]]/[[ksStat]]'s numeric orderings
    * don't apply. Per category: observed current count, expected
    * count `e = n_cur·(ref_k/n_ref)`, and the chi² term `(o−e)²/e`.
    * Σ terms against a χ²(k−1) table is the textbook read; the
    * per-category terms themselves say WHICH category moved.
    * Categories unseen in the reference get NULL expected/term (a
    * genuinely new category is a schema alarm, not a statistic —
    * flagged via `new_category`); categories that vanished from the
    * current slice still report (o = 0). Null keys count as a
    * category (nulls appearing is drift too).
    *
    * Determinism: counts are exact longs; `e` is
    * (n_cur·ref_k)/n_ref — one double division of exact products,
    * bridged decimal(18,9); the term re-bridges. Scale shape: one
    * (side, key) count shuffle bounded by DISTINCT categories (the
    * low-cardinality keyCol contract), broadcast 1-row totals. */
  def chiSquared(ref: DataFrame, cur: DataFrame,
      keyCol: String): DataFrame = {
    val r = ref.select(col(keyCol).cast("string").as("__k"),
      lit(1L).as("__r"), lit(0L).as("__c"))
    val c = cur.select(col(keyCol).cast("string").as("__k"),
      lit(0L).as("__r"), lit(1L).as("__c"))
    val counts = r.unionByName(c).groupBy("__k")
      .agg(sum("__r").as("n_ref"), sum("__c").as("n_cur"))
      .localCheckpoint() // two consumers: totals + the term projection
    val tot = broadcast(counts.agg(
      sum("n_ref").cast("long").as("__tr"),
      sum("n_cur").cast("long").as("__tc")))
    def bridge(e: Column): Column =
      e.cast("decimal(18,9)").cast("string").cast("double")
    counts.crossJoin(tot)
      .withColumn("expected",
        when(col("n_ref") > 0L, bridge(
          (col("__tc").cast("double") * col("n_ref").cast("double")) /
            col("__tr").cast("double"))))
      .withColumn("chi2_term",
        when(col("n_ref") > 0L && col("expected") > 0.0, bridge(
          (col("n_cur").cast("double") - col("expected")) *
            (col("n_cur").cast("double") - col("expected")) /
            col("expected"))))
      .select(col("__k").as(keyCol), col("n_ref"), col("n_cur"),
        col("expected"), col("chi2_term"),
        (col("n_ref") === 0L).as("new_category"))
  }
}
