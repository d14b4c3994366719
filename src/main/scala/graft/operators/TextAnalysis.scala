package graft.operators

import graft.functions.{banded_levenshtein, portableRound}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the pieces of a
  * training-data pipeline that score, count and fingerprint raw text.
  *
  * All operators are pure column expressions (whole-stage codegen'd, no UDFs)
  * so they scale linearly with a 100 TB corpus: each is a single projection or
  * one map-side-combinable aggregation; nothing shuffles except the final
  * per-source rollup.
  */
object TextAnalysis {

  /** Minimal English stopword list used by the language-ID heuristic and the
    * quality score. Kept tiny and fixed so results are reproducible. */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for", "with", "by", "at", "or")

  private def toks = split(col("text"), " ")
  private def stopHitsOf(c: org.apache.spark.sql.Column) =
    graft.functions.tokens_in_set(c, EnStopwords)

  // ── shared scoring expressions — the single source of truth consumed by
  //    langId / qualityScore / repetition AND the composite corpus filter
  //    (t10); changing a weight here changes every consumer together ──

  /** Token count of `text` (whitespace tokens). */
  def nTokensExpr: org.apache.spark.sql.Column = size(toks)

  /** English-stopword occurrence ratio (compiled TokensInSet probe). */
  def stopRatioExpr: org.apache.spark.sql.Column =
    stopHitsOf(toks).cast("double") / size(toks)

  /** Mean token length derived from `n_chars` and the token count. */
  def avgTokenLenExpr: org.apache.spark.sql.Column =
    (col("n_chars") - size(toks) + 1).cast("double") / size(toks)

  /** Heuristic language tag: CJK codepoints → zh, stopword-rich → en. */
  def predLangExpr(enThreshold: Double = 0.08): org.apache.spark.sql.Column =
    when(col("text").rlike("[\\x{4e00}-\\x{9fff}]"), "zh")
      .when(stopRatioExpr >= enThreshold, "en")
      .otherwise("und")

  /** Composite quality in [0,1]: 0.5·length + 0.3·stopwords + 0.2·token-len. */
  def qualityExpr: org.apache.spark.sql.Column =
    portableRound(least(size(toks) / 100.0, lit(1.0)) * 0.5 +
      stopRatioExpr * 0.3 + least(avgTokenLenExpr / lit(10.0), lit(1.0)) * 0.2, 4)

  /** Duplicated-3-shingle fraction; null for docs with < 3 tokens. */
  def dupRatioExpr: org.apache.spark.sql.Column = {
    val sh = graft.functions.shingle_hashes(col("text"), 3)
    when(size(sh) > 0,
      portableRound(lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh), 4))
  }

  /** Language ID, n-gram/stopword heuristic: CJK codepoints → zh, else
    * English-stopword token ratio over a threshold → en, else und.
    * (A real model would be a dictionary broadcast; the heuristic is the
    * scalable shape: one projection, no shuffle; stopword counting is the
    * compiled [[graft.functions.TokensInSet]] probe, not a HOF.) */
  def langId(documents: DataFrame, enThreshold: Double = 0.08): DataFrame =
    documents.select(
      col("doc_id"),
      col("lang"),
      portableRound(stopRatioExpr, 4).as("en_ratio"),
      predLangExpr(enThreshold).as("pred_lang"))

  /** Quality scoring: token count, average token length, stopword ratio,
    * composite score in [0,1]. Deterministic integer-ratio arithmetic. */
  def qualityScore(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      nTokensExpr.cast("long").as("n_tokens"),
      col("n_chars"),
      portableRound(avgTokenLenExpr, 4).as("avg_token_len"),
      portableRound(stopRatioExpr, 4).as("stop_ratio"),
      qualityExpr.as("quality"))

  /** Token counting per source: whitespace tokens plus a BPE-ish
    * `[a-z0-9]+` word-piece count; one partial-aggregated rollup. */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(toks).cast("long")).as("ws_tokens"),
      sum(regexp_count(col("text"), lit("[a-z0-9]+"))).as("word_tokens"))

  /** Canonical-token-set fingerprint: md5 over the sorted distinct token
    * list. Two docs with the same bag of words collide — the classic cheap
    * near-dup key (one projection; dedup on it is a hash groupBy). */
  def fingerprint(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      md5(array_join(array_sort(array_distinct(toks)), " ")).as("fingerprint"))

  /** Polynomial rolling hash of the raw text (base 31 mod 1e9+7 over
    * codepoints) — an order-sensitive fingerprint, unlike [[fingerprint]].
    * One compiled loop per document ([[graft.functions.RollingHash]]);
    * the `aggregate`-HOF formulation it replaces exploded the text into
    * per-character array elements and ran the lambda interpreted. */
  def rollingHash(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      graft.functions.rolling_hash(col("text")).as("rolling_hash"))

  /** PII scrub: emails, URLs and long digit runs replaced with typed
    * placeholder tokens — the standard pre-training redaction pass. Pure
    * regexp projection (one codegen'd pass, no shuffle). Patterns are
    * case-insensitive (`(?i)` — `ALICE@EXAMPLE.COM` is as much PII as the
    * lowercase form), and each audit count is taken on the text AS THE
    * REPLACEMENT SEES IT (URLs on raw text, emails after URL removal,
    * digit runs after both), so every count equals the number of
    * placeholders actually inserted — no phantom redactions for a digit
    * run that a URL replacement already consumed. */
  def scrub(documents: DataFrame): DataFrame = {
    val emailPat = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+"
    val urlPat = "(?i)https?://[^ ]+"
    val digitsPat = "[0-9]{4,}"
    val afterUrl = regexp_replace(col("text"), urlPat, "<URL>")
    val afterEmail = regexp_replace(afterUrl, emailPat, "<EMAIL>")
    documents.select(
      col("doc_id"),
      regexp_replace(afterEmail, digitsPat, "<NUM>").as("scrubbed"),
      regexp_count(col("text"), lit(urlPat)).cast("long").as("n_urls"),
      regexp_count(afterUrl, lit(emailPat)).cast("long").as("n_emails"),
      regexp_count(afterEmail, lit(digitsPat)).cast("long").as("n_long_nums"))
  }

  /** Gopher-style repetition signal: the fraction of duplicated 3-token
    * shingles per document (`1 − distinct/total`), flagged above
    * `maxDupRatio`. Highly repetitive machine-generated text scores near
    * 1; one projection over the one-pass shingle kernel. */
  def repetition(documents: DataFrame, maxDupRatio: Double = 0.2): DataFrame =
    documents.filter(size(split(col("text"), " ")) >= 3)
      .select(
        col("doc_id"),
        size(graft.functions.shingle_hashes(col("text"), 3)).cast("long").as("n_shingles"),
        dupRatioExpr.as("dup_ratio"),
        (dupRatioExpr > maxDupRatio).as("flagged"))

  /** FK1 — Flesch–Kincaid readability (Flesch 1948; Kincaid et al. 1975,
    * the grade-level recalibration): grade = 0.39·(words/sentence) +
    * 11.8·(syllables/word) − 15.59 and reading-ease = 206.835 −
    * 1.015·(words/sentence) − 84.6·(syllables/word), computed with the
    * deterministic heuristics an engine-side corpus filter actually
    * runs: syllables(word) = max(1, maximal `[aeiouy]+` runs) and
    * sentences = max(1, count of `.!?`). Educational-quality routing
    * (the FineWeb-Edu-style proxy features) reads exactly this
    * histogram — per (source, clamped integer grade bucket): doc count
    * plus micro-exact mean grade and mean ease.
    *
    * Scale shape: one codegen'd projection (regexp counts over the
    * token array — no UDF) + ONE map-side-combinable rollup keyed
    * (source, bucket): bill 1 at any corpus size. */
  def readability(documents: DataFrame): DataFrame = {
    val words = size(toks).cast("double")
    val syll = aggregate(
      transform(split(lower(col("text")), " "),
        w => greatest(lit(1), regexp_count(w, lit("[aeiouy]+")))),
      lit(0L), (a, x) => a + x.cast("long")).cast("double")
    val sents = greatest(lit(1), regexp_count(col("text"), lit("[.!?]")))
      .cast("double")
    val grade = portableRound(
      lit(0.39) * (words / sents) + lit(11.8) * (syll / words) - lit(15.59), 4)
    val ease = portableRound(
      lit(206.835) - lit(1.015) * (words / sents) - lit(84.6) * (syll / words), 4)
    def microMean(c: org.apache.spark.sql.Column) = portableRound(
      sum(portableRound(c * 10000.0, 0).cast("long")).cast("double")
        / 10000.0 / count(lit(1)), 4)
    documents
      .select(col("source"), grade.as("grade"), ease.as("ease"))
      .groupBy(col("source"),
        least(lit(18L), greatest(lit(0L), floor(col("grade"))))
          .as("grade_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        microMean(col("grade")).as("mean_grade"),
        microMean(col("ease")).as("mean_ease"))
  }

  /** CS1 — code-switching / language-consistency audit: classify each
    * fixed 40-token window of a document with the t1 language heuristic
    * (CJK codepoints → zh, stopword ratio ≥ 0.08 → en, else und) and
    * count adjacent-window language SWITCHES — the doc-level signal a
    * multilingual curation pipeline uses to route mixed-language
    * documents (whole-doc lang-id mislabels them; language-pure training
    * corpora drop or split them). Per source: doc counts, how many
    * multi-window docs switch at all, total switches, and the
    * micro-exact mean dominant-language share.
    *
    * Scale shape: entirely IN-ROW — the window langs, the adjacent
    * comparison and the dominant share are array expressions over the
    * token split (no explode, no per-window rows); the single exchange
    * is the source rollup. Bill 1 at any corpus size. */
  def codeSwitch(documents: DataFrame, window: Int = 40): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val t = split(col("text"), " ")
    val nWin = ceil(size(t).cast("double") / window).cast("int")
    def winLang(i: org.apache.spark.sql.Column) = {
      val wt = slice(t, i * window + 1, lit(window))
      val stopHits = size(filter(wt, w => w.isin(EnStopwords: _*)))
      when(array_join(wt, " ").rlike("[\\x{4e00}-\\x{9fff}]"), "zh")
        .when(stopHits.cast("double") / size(wt) >= 0.08, "en")
        .otherwise("und")
    }
    val wl = transform(sequence(lit(0), nWin - 1), i => winLang(i))
    val switches = when(size(wl) >= 2,
      size(filter(transform(sequence(lit(2), size(wl)),
        j => element_at(wl, j) =!= element_at(wl, j - 1)), b => b)))
      .otherwise(0).cast("long")
    val domShare = portableRound(
      array_max(transform(array(lit("en"), lit("zh"), lit("und")),
        l => size(filter(wl, x => x === l)))).cast("double") / size(wl), 4)
    documents
      .select(col("source"), switches.as("sw"),
        (size(wl) >= 2).as("multi"), domShare.as("share"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("multi"), 1L).otherwise(0L)).as("n_multi_window"),
        sum(when(col("sw") >= 1, 1L).otherwise(0L)).as("n_switched"),
        sum(col("sw")).as("sum_switches"),
        portableRound(
          sum(portableRound(col("share") * 10000.0, 0).cast("long"))
            .cast("double") / 10000.0 / count(lit(1)), 4)
          .as("mean_dominant_share"))
  }

  /** CHUNK1 — RAG-style token-window chunking with overlap: every document
    * is split into `window`-token chunks starting every `stride` tokens
    * (stride < window ⇒ adjacent chunks share window−stride tokens; the
    * trailing chunks may be shorter). This is the context-preparation pass
    * a retrieval or fine-tuning pipeline runs before embedding, and the
    * inverse of [[graft.Queries.pk1SequencePack]]'s packing.
    *
    * Scale shape: a pure narrow projection — `sequence` of chunk starts,
    * `posexplode`, `slice` over the once-split token array, all inside
    * whole-stage codegen; no shuffle anywhere, and the output is at most
    * ⌈window/stride⌉× the corpus (linear). Chunk ids are (doc_id,
    * chunk_idx) so downstream embedding joins need no global counter. */
  def chunkDocuments(documents: DataFrame, window: Int = 64, stride: Int = 48): DataFrame = {
    require(window >= 1 && stride >= 1, s"window/stride must be >= 1, got $window/$stride")
    documents
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"), col("tk"),
        posexplode(sequence(lit(0), size(col("tk")) - 1, lit(stride))))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        least(lit(window), size(col("tk")) - col("col")).cast("long").as("n_tokens"),
        array_join(slice(col("tk"), col("col") + 1, lit(window)), " ").as("chunk_text"))
  }

  /** Per-document unigram Shannon entropy — the lexical-diversity quality
    * signal (low entropy = boilerplate/keyword-stuffed text even when
    * t9's adjacent-repetition ratio looks clean; filtering pipelines use
    * it next to length and stop-ratio). H = ln(n) − (Σ_t c_t·ln c_t)/n
    * over the doc's token histogram; `norm_entropy` divides by ln(n)
    * (the max for n tokens) so thresholds transfer across lengths.
    *
    * Scale shape: two compact-key exchanges — a (doc_id, token) count
    * (map-side combinable) and the per-doc rollup — carrying counts
    * only, never text. Determinism: each c·ln c term snaps to integer
    * micro-units and the per-doc sum folds BIGINTs (exact, order-free —
    * the [[graft.operators.Importance]] discipline), so the oracle hash
    * is partition-independent; the two outer `ln` calls take
    * integer-valued doubles, identical bits in any engine. */
  def tokenEntropy(documents: DataFrame): DataFrame = {
    val perTok = documents.select(col("doc_id"), explode(toks).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .withColumn("_m",
        floor(col("c").cast("double") * log(col("c").cast("double")) * 1000000.0 + 0.5)
          .cast("long"))
    val nD = col("n_tokens").cast("double")
    val hRaw = log(nD) - (col("_ms").cast("double") / 1000000.0) / nD
    perTok.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("distinct_tokens"),
        sum(col("_m")).as("_ms"))
      .select(col("doc_id"), col("n_tokens"), col("distinct_tokens"),
        portableRound(hRaw, 4).as("entropy"),
        when(col("n_tokens") > 1, portableRound(hRaw / log(nD), 4))
          .otherwise(lit(0.0)).as("norm_entropy"))
  }

  /** Deterministic token perturbation — the augmentation / masked-LM prep
    * pass of a training pipeline, with the same engine-portable
    * determinism contract as every sampler here: the per-position verdict
    * is a pure salted-md5 function of (doc, position), so the augmented
    * corpus is identical across engines, runs, partitionings and epochs
    * (vary the salt to get a fresh draw — the [[Sampling.epochShuffle]]
    * convention).
    *
    * `mode = "dropout"` removes selected tokens (word-dropout
    * augmentation); `mode = "mask"` replaces them with `[MASK]` (the
    * BERT-style denoising objective's input). Rates are bucket-resolution
    * (1e-4).
    *
    * Scale shape: one narrow projection — the lambda runs inside the
    * array functions with zero exchanges; cost is one md5 per token.
    */
  def tokenPerturb(documents: DataFrame, mode: String,
                   rate: Double, salt: String = "aug1"): DataFrame = {
    require(mode == "dropout" || mode == "mask", s"unknown mode: $mode")
    require(rate > 0 && rate < 1, s"rate must be in (0, 1), got $rate")
    val thresh = (rate * 10000).round
    // 1-based position, matching the oracle's RANGE(1, len+1)
    def hit(i: org.apache.spark.sql.Column) =
      Sampling.hashBucket(concat(lit(s"$salt:"), col("doc_id").cast("string"),
        lit(":"), (i + 1).cast("string"))) < thresh
    val out = mode match {
      case "dropout" => filter(toks, (_, i) => !hit(i))
      case "mask" => transform(toks, (t, i) => when(hit(i), lit("[MASK]")).otherwise(t))
    }
    val affected = filter(toks, (_, i) => hit(i))
    documents.select(col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(affected).cast("long").as("n_affected"),
      array_join(out, " ").as("new_text"))
  }

  /** Corpus BLEU of a deterministic candidate set against the documents
    * as references — the text-generation leg of the model-eval family
    * (ml2 calibration / ml3 AUC / ndcg1 are the classifier and ranking
    * legs). Candidates are the [[tokenPerturb]]-style dropout twins
    * (salted per-position hash verdicts, so the "model output" is
    * reproducible across engines): modified n-gram precision p_n for
    * n = 1..`maxN` — Σ clipped counts / Σ candidate n-gram counts, the
    * Papineni et al. corpus form, NOT a mean of sentence scores — plus
    * the brevity penalty exp(1 − ref/cand) and
    * BLEU = BP · exp(Σ ln p_n / maxN).
    *
    * Determinism: every count is an exact BIGINT folded map-side (the
    * clipped counter is the compiled
    * [[graft.functions.NgramClippedOverlap]] kernel — one hash-count pass
    * per row; a declarative form needs nested CodegenFallback lambdas);
    * p_n and BP snap to the 1e-6 grid BEFORE entering the log/exp
    * combination, so the whole readout replays digit-exact in the DuckDB
    * oracle (ml1's discipline). p_n = 0 is clamped to 1e-9 inside the
    * log, mirrored in the oracle.
    *
    * Scale shape: ONE projection + ONE map-side-combinable aggregate over
    * the corpus (2 + 2·maxN BIGINT sums) — no shuffle wider than the
    * 1-row result, any corpus size. */
  def corpusBleu(documents: DataFrame, rate: Double = 0.1,
                 salt: String = "bleu", maxN: Int = 4): DataFrame = {
    require(rate > 0 && rate < 1, s"rate must be in (0, 1), got $rate")
    require(maxN >= 1 && maxN <= 8, s"maxN out of range: $maxN")
    val thresh = (rate * 10000).round
    def hitAt(i: org.apache.spark.sql.Column) =
      Sampling.hashBucket(concat(lit(s"$salt:"), col("doc_id").cast("string"),
        lit(":"), (i + 1).cast("string"))) < thresh
    val cand = filter(toks, (_, i) => !hitAt(i))
    val proj = documents.select(toks.as("_ref"), cand.as("_cand"))
    val aggs =
      Seq(sum(size(col("_cand")).cast("long")).as("cand_tokens"),
        sum(size(col("_ref")).cast("long")).as("ref_tokens")) ++
      (1 to maxN).flatMap { n =>
        Seq(
          sum(graft.functions.ngram_clipped_overlap(
            col("_cand"), col("_ref"), n)).as(s"clipped_$n"),
          sum(greatest(size(col("_cand")) - (n - 1), lit(0)).cast("long"))
            .as(s"total_$n"))
      }
    val a = proj.agg(aggs.head, aggs.tail: _*)
    def r6(c: org.apache.spark.sql.Column) =
      floor(c * 1000000.0 + 0.5) / 1000000.0
    val withP = a.select(Seq(col("cand_tokens"), col("ref_tokens")) ++
      (1 to maxN).flatMap(n => Seq(col(s"clipped_$n"), col(s"total_$n"),
        when(col(s"total_$n") > 0,
          r6(col(s"clipped_$n").cast("double") / col(s"total_$n").cast("double")))
          .otherwise(0.0).as(s"p_$n"))): _*)
    val bp = when(col("cand_tokens") >= col("ref_tokens"), lit(1.0))
      .otherwise(when(col("cand_tokens") > 0,
        r6(exp(lit(1.0) -
          col("ref_tokens").cast("double") / col("cand_tokens").cast("double"))))
        .otherwise(lit(0.0)))
    val logSum = (1 to maxN)
      .map(n => log(greatest(col(s"p_$n"), lit(1e-9)))).reduce(_ + _)
    withP.withColumn("bp", bp)
      .withColumn("bleu", r6(col("bp") * exp(logSum * (lit(1.0) / maxN))))
  }

  /** Corpus ROUGE-N (recall-oriented n-gram overlap) of the SAME
    * deterministic candidate set [[corpusBleu]] scores — the two metrics
    * share the clipped-count kernel because Σ_g min(count_cand, count_ref)
    * is symmetric in role: BLEU divides it by candidate n-gram totals
    * (precision), ROUGE by REFERENCE totals (recall); F1 combines the two
    * snapped ratios. One projection + one map-side aggregate, same scale
    * shape as corpusBleu. */
  def corpusRouge(documents: DataFrame, rate: Double = 0.1,
                  salt: String = "bleu", maxN: Int = 2): DataFrame = {
    require(rate > 0 && rate < 1, s"rate must be in (0, 1), got $rate")
    require(maxN >= 1 && maxN <= 8, s"maxN out of range: $maxN")
    val thresh = (rate * 10000).round
    def hitAt(i: org.apache.spark.sql.Column) =
      Sampling.hashBucket(concat(lit(s"$salt:"), col("doc_id").cast("string"),
        lit(":"), (i + 1).cast("string"))) < thresh
    val cand = filter(toks, (_, i) => !hitAt(i))
    val proj = documents.select(toks.as("_ref"), cand.as("_cand"))
    val aggs = (1 to maxN).flatMap { n =>
      Seq(
        sum(graft.functions.ngram_clipped_overlap(
          col("_cand"), col("_ref"), n)).as(s"clipped_$n"),
        sum(greatest(size(col("_cand")) - (n - 1), lit(0)).cast("long"))
          .as(s"cand_total_$n"),
        sum(greatest(size(col("_ref")) - (n - 1), lit(0)).cast("long"))
          .as(s"ref_total_$n"))
    }
    val a = proj.agg(aggs.head, aggs.tail: _*)
    def r6(c: org.apache.spark.sql.Column) =
      floor(c * 1000000.0 + 0.5) / 1000000.0
    def ratio(num: String, den: String) =
      when(col(den) > 0,
        r6(col(num).cast("double") / col(den).cast("double"))).otherwise(0.0)
    val withPr = a.select((1 to maxN).flatMap(n => Seq(
      col(s"clipped_$n"), col(s"cand_total_$n"), col(s"ref_total_$n"),
      ratio(s"clipped_$n", s"cand_total_$n").as(s"precision_$n"),
      ratio(s"clipped_$n", s"ref_total_$n").as(s"rouge_$n"))): _*)
    (1 to maxN).foldLeft(withPr)((d, n) => d.withColumn(s"f1_$n",
      when(col(s"precision_$n") + col(s"rouge_$n") > 0,
        r6(lit(2.0) * col(s"precision_$n") * col(s"rouge_$n") /
          (col(s"precision_$n") + col(s"rouge_$n")))).otherwise(0.0)))
  }

  /** Corpus chrF (Popović 2015): character n-gram F-β of the SAME
    * deterministic candidate set [[corpusBleu]] and [[corpusRouge]]
    * score — the third leg of the MT-eval family, and the one that stays
    * informative when tokenization is unreliable (sub-word edits move
    * character grams smoothly where word grams flip whole tokens).
    * Whitespace is removed before gram extraction (the paper's default);
    * per n = 1..`maxN` the corpus-level clipped counts fold through the
    * SAME compiled [[graft.functions.NgramClippedOverlap]] kernel on
    * char arrays; chrP/chrR average the per-n snapped precisions/recalls
    * and chrF = (1+β²)·P·R / (β²·P + R) with β = 2.
    *
    * Exactness: clipped and total counts are exact BIGINT folds
    * (order-free); every ratio snaps to the 1e-6 grid before the fixed
    * textual average/F-β formula, which the DuckDB oracle replays
    * verbatim. Shape: one projection + ONE map-side aggregate over the
    * corpus — no shuffle wider than a 1-row aggregate at any scale. */
  def corpusChrF(documents: DataFrame, rate: Double = 0.1,
                 salt: String = "bleu", maxN: Int = 6,
                 beta: Double = 2.0): DataFrame = {
    require(rate > 0 && rate < 1, s"rate must be in (0, 1), got $rate")
    require(maxN >= 1 && maxN <= 8, s"maxN out of range: $maxN")
    require(beta > 0, s"beta must be positive, got $beta")
    val thresh = (rate * 10000).round
    def hitAt(i: org.apache.spark.sql.Column) =
      Sampling.hashBucket(concat(lit(s"$salt:"), col("doc_id").cast("string"),
        lit(":"), (i + 1).cast("string"))) < thresh
    val cand = filter(toks, (_, i) => !hitAt(i))
    // ONE compiled pass per row computes every (clipped, cand_total,
    // ref_total) triple over the whitespace-free char streams — no char
    // arrays materialize, no per-n kernel calls (the element_at-sums
    // consumption pattern)
    val proj = documents.select(graft.functions.char_ngram_stats(
      array_join(cand, ""), array_join(toks, ""), maxN).as("_st"))
    val aggs = (1 to maxN).flatMap { n =>
      val base = 3 * (n - 1)
      Seq(
        sum(element_at(col("_st"), base + 1)).as(s"clipped_$n"),
        sum(element_at(col("_st"), base + 2)).as(s"cand_total_$n"),
        sum(element_at(col("_st"), base + 3)).as(s"ref_total_$n"))
    }
    val a = proj.agg(aggs.head, aggs.tail: _*)
    def r6(c: org.apache.spark.sql.Column) =
      floor(c * 1000000.0 + 0.5) / 1000000.0
    def ratio(num: String, den: String) =
      when(col(den) > 0,
        r6(col(num).cast("double") / col(den).cast("double"))).otherwise(0.0)
    val withPr = a.select((1 to maxN).flatMap(n => Seq(
      col(s"clipped_$n"), col(s"cand_total_$n"), col(s"ref_total_$n"),
      ratio(s"clipped_$n", s"cand_total_$n").as(s"p_$n"),
      ratio(s"clipped_$n", s"ref_total_$n").as(s"r_$n"))): _*)
    val chrP = r6((1 to maxN).map(n => col(s"p_$n")).reduce(_ + _) /
      lit(maxN.toDouble))
    val chrR = r6((1 to maxN).map(n => col(s"r_$n")).reduce(_ + _) /
      lit(maxN.toDouble))
    val b2 = beta * beta
    withPr.withColumn("chr_p", chrP).withColumn("chr_r", chrR)
      .withColumn("chrf", when(
        lit(b2) * col("chr_p") + col("chr_r") > 0,
        r6(lit(1.0 + b2) * col("chr_p") * col("chr_r") /
          (lit(b2) * col("chr_p") + col("chr_r")))).otherwise(0.0))
  }

  /** Cohen's κ (Cohen 1960) of the [[langId]] heuristic's English call
    * against the ground-truth label — the chance-corrected accuracy
    * lid1's raw confusion shares cannot express: a detector that says
    * "en" for everything on a 90%-English corpus scores 90% accuracy
    * but κ = 0, because agreement-by-chance is subtracted out. The
    * standard acceptance readout for any labeling heuristic.
    *
    * Exactness: the 2×2 cells are exact integer counts; p_o and p_e are
    * integer ratios snapped to the 1e-6 grid, and κ = (p_o − p_e)/(1 −
    * p_e) is one fixed double formula on the same grid (κ undefined at
    * p_e = 1 — a constant-rater degenerate — reports 0). Shape: the
    * langId projection + ONE map-side 1-row aggregate. */
  def kappaAgreement(documents: DataFrame,
                     enThreshold: Double = 0.08): DataFrame = {
    val p = langId(documents, enThreshold)
      .select((col("pred_lang") === "en").cast("long").as("a"),
        (col("lang") === "en").cast("long").as("b"))
    val m = p.agg(count(lit(1)).as("n"),
      sum(when(col("a") === 1 && col("b") === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(col("a") === 1 && col("b") === 0, 1L).otherwise(0L)).as("fp"),
      sum(when(col("a") === 0 && col("b") === 1, 1L).otherwise(0L)).as("fn"),
      sum(when(col("a") === 0 && col("b") === 0, 1L).otherwise(0L)).as("tn"))
    def r6(c: org.apache.spark.sql.Column) = portableRound(c, 6)
    val nD = col("n").cast("double")
    val po = (col("tp") + col("tn")).cast("double") / nD
    val pe = ((col("tp") + col("fp")).cast("double") *
      (col("tp") + col("fn")).cast("double") +
      (col("fn") + col("tn")).cast("double") *
        (col("fp") + col("tn")).cast("double")) / (nD * nD)
    m.select(col("n"), col("tp"), col("fp"), col("fn"), col("tn"),
      when(col("n") > 0, r6(po)).otherwise(0.0).as("p_o"),
      when(col("n") > 0, r6(pe)).otherwise(0.0).as("p_e"),
      when(col("n") > 0 && pe < 1.0, r6((po - pe) / (lit(1.0) - pe)))
        .otherwise(0.0).as("kappa"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
    * the word co-occurrence graph — the graph family applied to the text
    * family. Votes come from adjacency, not frequency alone: a word
    * ranks high when its NEIGHBORS rank high, which is what separates
    * connective corpus vocabulary from merely repeated tokens (t7's
    * tf-idf scores the latter).
    *
    * Construction is deterministic end to end: the vocabulary is the top
    * `vocab` corpus tokens (count desc, token asc on ties), edges are
    * the distinct adjacent-token pairs with BOTH ends in vocabulary
    * (symmetrized; self-pairs dropped), and the walk is
    * [[Graph.pageRank]]'s fixed-iteration decimal-grid fold, so the
    * oracle unrolls it digit for digit. Shape: one token scan → counts
    * (map-side combinable), a driver-bounded top-`vocab` take, bigram
    * pairs built INSIDE the row (a lambda over the token array — no
    * positional self-join), broadcast vocabulary membership joins, then
    * pr1's bounded-graph rounds: the corpus pays two scans, the graph
    * work is vocabulary-sized forever. */
  def textRank(documents: DataFrame, vocab: Int = 100,
               iters: Int = 5): DataFrame = {
    require(vocab >= 2 && vocab <= 10000, s"vocab out of range: $vocab")
    val words = documents.select(explode(toks).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word").asc).limit(vocab)
      .select(col("word")).localCheckpoint()
    val pairs = documents.select(explode(expr(
      """transform(slice(split(text, ' '), 1, greatest(size(split(text, ' ')) - 1, 0)),
        |  (t, i) -> struct(t AS a, split(text, ' ')[i + 1] AS b))""".stripMargin))
      .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= col("b"))
    val inVocab = pairs
      .join(broadcast(words.withColumnRenamed("word", "a")), Seq("a"))
      .join(broadcast(words.withColumnRenamed("word", "b")), Seq("b"))
    // canonicalize BEFORE the distinct and symmetrize AFTER it: the
    // earlier union-of-two-projections put the whole corpus-sized pair
    // pipeline on both union branches (Spark does not dedup cross-branch
    // subplans — the pref1 lesson), scanning documents twice per build.
    // The distinct set of unordered pairs emitted in both directions is
    // the identical edge set.
    val canon = inVocab
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    val edges = canon.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(canon.select(col("b").as("src"), col("a").as("dst")))
    Graph.pageRank(words.select(col("word").as("node")), edges, iters)
      .select(col("node").as("word"), col("rank"))
      .orderBy(col("rank").desc, col("word").asc)
  }

  /** Corpus WER (word error rate): token-level Levenshtein distance
    * between each reference and a deterministically corrupted candidate
    * (delete below `delThresh`, substitute below `subThresh` on the same
    * per-position hash — the bleu/rouge/chrf derivation extended with
    * substitutions, which pure dropout can't exercise), summed over the
    * corpus and divided by reference token mass. Completes the MT-eval
    * family with its alignment-cost leg: BLEU/chrF score overlap
    * regardless of order, WER charges every insertion/deletion/
    * substitution an edit.
    *
    * Both engines run the DP over each token encoded as ONE
    * printable-ASCII char from the doc's own vocabulary (ref tokens +
    * the substitution marker) — Levenshtein is invariant under
    * injective relabeling, so the two engines' different vocab orders
    * cannot disagree; ASCII keeps DuckDB's byte-level and Spark's
    * codepoint-level DP on the same units. Docs with more than 94
    * distinct tokens fail LOUDLY (raise_error) rather than alias two
    * tokens onto one char — the fixture max is 31; a corpus that trips
    * this needs the marker alphabet widened, not a silent wrong
    * distance. The oracle keeps DuckDB's built-in `levenshtein`; the
    * engine runs [[graft.functions.BandedLevenshtein]] under a
    * certified per-row band (see below) — identical distances, a band
    * narrower than the true distance is structurally impossible here.
    *
    * Exactness: distances and token counts are exact BIGINT folds; the
    * single WER ratio snaps to the 1e-6 grid. Shape: per-row encode +
    * per-row DP (row-local, whole-stage codegen'd) + ONE map-side 1-row
    * aggregate — no shuffle wider than one row at any scale; the banded
    * DP costs O(len·band) per row with band = the row's own corruption
    * count, and the operator is linear in rows. */
  def corpusWer(documents: DataFrame, delThresh: Int = 500,
                subThresh: Int = 1500, salt: String = "wer"): DataFrame = {
    require(delThresh >= 0 && subThresh >= delThresh && subThresh <= 10000,
      s"need 0 <= delThresh <= subThresh <= 10000, got $delThresh/$subThresh")
    val SUB = "\u0001" // gram-separator plane: never a whitespace token
    def hb(i: org.apache.spark.sql.Column) =
      Sampling.hashBucket(concat(lit(s"$salt:"), col("doc_id").cast("string"),
        lit(":"), (i + 1).cast("string")))
    val idxed = transform(toks, (t, i) =>
      struct(hb(i).as("h"), t.as("t")))
    val cand = transform(
      filter(idxed, x => x("h") >= delThresh),
      x => when(x("h") < subThresh, lit(SUB)).otherwise(x("t")))
    // per-doc vocab: ref tokens + SUB (every cand token is one of these);
    // token -> chr(32 + 1-based position), printable single-byte ASCII
    val vocab = array_distinct(concat(toks, array(lit(SUB))))
    def enc(ts: org.apache.spark.sql.Column) = concat_ws("",
      transform(ts, t => char(lit(32) + array_position(col("_v"), t))))
    // The DP is BANDED with a per-row CERTIFIED bound: the candidate is
    // the reference minus known deletions and substitutions, so its true
    // edit distance is ≤ #deleted + #substituted = (nr − nc) + #SUB — the
    // banded DP is therefore exact by construction (distance ≤ band), at
    // O(len·band) per row instead of the full O(len²) that made wer1 the
    // board's worst 10× guard ratio. Both engines still agree digit for
    // digit: banding never changes a distance it can certify, and the
    // DuckDB oracle keeps its plain levenshtein.
    val proj = documents
      .select(toks.as("_r"), cand.as("_c"), vocab.as("_v"))
      .select(size(col("_r")).cast("long").as("nr"),
        size(col("_c")).cast("long").as("nc"),
        size(filter(col("_c"), t => t === lit(SUB))).cast("long").as("nsub"),
        col("_r"), col("_c"), col("_v"))
      .select(col("nr"), col("nc"),
        when(size(col("_v")) > 94, raise_error(concat(
          lit("wer: doc vocabulary exceeds the 94-char encode alphabet ("),
          size(col("_v")).cast("string"), lit(" distinct tokens)"))))
          .otherwise(banded_levenshtein(enc(col("_c")), enc(col("_r")),
            col("nr") - col("nc") + col("nsub")))
          .cast("long").as("dist"))
    proj.agg(count(lit(1)).as("n_docs"),
        sum(col("nr")).as("ref_tokens"),
        sum(col("nc")).as("cand_tokens"),
        sum(col("dist")).as("edits"))
      .withColumn("wer", when(col("ref_tokens") > 0,
        floor(col("edits").cast("double") / col("ref_tokens").cast("double")
          * 1000000.0 + 0.5) / 1000000.0).otherwise(0.0))
  }

  /** Zipf-law fit of the token frequency distribution: OLS slope of
    * ln(count) on ln(rank) over the top-`topK` tokens — the corpus-health
    * fingerprint (natural language sits near slope −1; templated or
    * synthetic text shows up as a flat or broken power law).
    *
    * Scale shape: one token-count aggregation (vocabulary-sized), a
    * TakeOrdered top-K cut (the fit set is CONSTANT-bounded at any corpus
    * size — that is what the cap is for), and a single-partition
    * row_number over those K rows only. Determinism: the two `ln` values
    * snap to micro-units per term and every OLS moment is an exact BIGINT
    * fold; only the final closed-form division runs in doubles, on
    * identical operands in both engines. */
  def zipfFit(documents: DataFrame, topK: Int = 500): DataFrame = {
    require(topK >= 2, s"topK must be >= 2, got $topK")
    import org.apache.spark.sql.expressions.Window
    val counts = documents.select(explode(toks).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("c").desc, col("tok").asc)
    val ranked = counts.orderBy(col("c").desc, col("tok").asc).limit(topK)
      .withColumn("rank", row_number().over(w))
    def micro(c: org.apache.spark.sql.Column) =
      floor(log(c.cast("double")) * 1000000.0 + 0.5).cast("long")
    val m = ranked.select(micro(col("rank")).as("_x"), micro(col("c")).as("_y"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(col("_x") * col("_y")).as("_sxy"),
        sum(col("_x") * col("_x")).as("_sxx"))
    val n = col("n_terms").cast("double")
    val sx = col("_sx").cast("double"); val sy = col("_sy").cast("double")
    val sxy = col("_sxy").cast("double"); val sxx = col("_sxx").cast("double")
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy / 1000000.0 - slope * (sx / 1000000.0)) / n
    m.select(col("n_terms"),
      when(col("n_terms") > 1, portableRound(slope, 4)).otherwise(0.0).as("slope"),
      when(col("n_terms") > 1, portableRound(intercept, 4)).otherwise(0.0)
        .as("intercept_ln"))
  }

  /** Robust length-outlier flagging: Tukey's IQR fence over the per-doc
    * token count — the standard "drop the truncated fragments and the
    * concatenation monsters" pass before training. A doc is an outlier
    * outside [q1 − k·IQR, q3 + k·IQR] (k = 1.5 classic).
    *
    * Scale shape: the quantiles are ONE aggregation over a single double
    * column (exact interpolated percentile here for oracle parity; at
    * 100 TB swap in the `percentile_approx` sketch exactly as q7 does —
    * the fence moves by the sketch's ε, nothing else changes), broadcast
    * back as a 1-row literal join — the t7 scalar pattern, no driver
    * round-trip. Fences are portably rounded so both engines compare the
    * same 4-decimal boundary against integer counts. */
  def lengthOutliers(documents: DataFrame, k: Double = 1.5): DataFrame = {
    val lens = documents.select(col("doc_id"), nTokensExpr.cast("long").as("n_tokens"))
    val fences = lens.agg(
      percentile(col("n_tokens"), lit(0.25)).as("q1"),
      percentile(col("n_tokens"), lit(0.75)).as("q3"))
      .select(
        portableRound(col("q1") - (col("q3") - col("q1")) * k, 4).as("lo"),
        portableRound(col("q3") + (col("q3") - col("q1")) * k, 4).as("hi"))
    lens.crossJoin(broadcast(fences))
      .select(col("doc_id"), col("n_tokens"), col("lo"), col("hi"),
        (col("n_tokens") < col("lo") || col("n_tokens") > col("hi")).as("is_outlier"))
  }

  /** Vocabulary build + token-id encoding — the tokenize-to-ids step a
    * pretraining pipeline runs before packing: the top-`vocabSize`
    * corpus tokens get stable ids (frequency-descending, token-ascending
    * ties; id 0 = OOV/unknown), and every document becomes its id
    * sequence, serialized space-joined so the harness can sort/hash it.
    *
    * Scale shape: the vocabulary count is one map-side-combined
    * aggregation + TakeOrderedAndProject (each partition ships only its
    * own top V); id assignment is a window over the ALREADY-LIMITED
    * V-row dictionary (codebook-class metadata, like the IVF centroids —
    * not a data-sized global sort); encoding is a broadcast dictionary
    * join; reassembly is one shuffle of (doc_id, pos, int) triples. At
    * 100 TB the dictionary stays a few MB however large the corpus. */
  def vocabEncode(documents: DataFrame, vocabSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val flat = documents.select(col("doc_id"),
      posexplode(toks).as(Seq("pos", "token")))
    val vocab = flat.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(vocabSize)
      .withColumn("tid", row_number().over(
        Window.orderBy(col("cnt").desc, col("token"))))
      .select(col("token"), col("tid"))
    flat.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("pos"),
        coalesce(col("tid"), lit(0)).as("tid")))).as("s"))
      .select(col("doc_id"), concat_ws(" ", col("s.tid")).as("token_ids"))
  }

  /** Bigram collocations by pointwise mutual information: adjacent token
    * pairs whose corpus count ≥ `minCount`, scored by
    * ln(p(ab) / (p(a)·p(b))) — the standard collocation detector
    * (phrases like "new york" score high, chance pairs near 0).
    *
    * Shape: the pair stream comes from an in-scan array transform (no
    * self-join on position), then two count aggregations keyed on the
    * token — at 100 TB those are plain shuffles on 8-byte-ish keys, and
    * the two unigram-count joins ride the same token partitioning. The
    * corpus totals are 1-row aggregates broadcast in-DAG. The PMI double
    * formula is fixed (divide-then-multiply order) and rounded, so both
    * engines rank identical values. */
  def bigramPmi(documents: DataFrame, minCount: Long = 10): DataFrame = {
    val pairs = documents.select(toks.as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS a, t[i+1] AS b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val big = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
    val uni = documents.select(explode(toks).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))
    val totals = uni.agg(sum(col("n_tok")).as("n_total"))
      .crossJoin(big.agg(sum(col("n_ab")).as("n_big")))
    val pmi = log((col("n_ab").cast("double") / col("n_big")) /
      ((col("n_a").cast("double") / col("n_total")) *
        (col("n_b").cast("double") / col("n_total"))))
    big.filter(col("n_ab") >= minCount)
      .join(uni.select(col("tok").as("a"), col("n_tok").as("n_a")), "a")
      .join(uni.select(col("tok").as("b"), col("n_tok").as("n_b")), "b")
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("n_ab"), portableRound(pmi, 4).as("pmi"))
  }

  /** Interpolated Kneser–Ney bigram probabilities (Kneser & Ney 1995;
    * Chen & Goodman 1999 formulation) with absolute discount D = 0.75 —
    * the production n-gram smoothing beside [[unigramSurprisal]]'s
    * Laplace unigram: backoff mass goes to the CONTINUATION probability
    * (how many distinct contexts a word follows), which is what keeps a
    * frequent-but-single-context token ("Francisco") from stealing
    * probability it never earns.
    *
    *   P(b|a) = max(c(ab)−D, 0)/c(a·)
    *          + D·N1+(a,·)/c(a·) · N1+(·,b)/N1+(··)
    *
    * Exactness: every term is an exact BIGINT count (bigram counts,
    * distinct-successor/predecessor type counts, the type total);
    * D = 0.75 is exact in binary, the combination is ONE fixed textual
    * double expression, and the result snaps to the 1e-6 grid — the
    * oracle replays it digit for digit. Over each context the
    * probabilities of observed successors sum to ≤ 1, with equality
    * when the context has seen the whole vocabulary (spec-pinned).
    *
    * Shape: one bigram aggregation (the only data-sized shuffle), two
    * vocabulary-sized context rollups joined back on the token keys,
    * one broadcast 1-row type total — the same skeleton as [[bigramPmi]],
    * so the two smoothing readouts share partitioning at scale. */
  def kneserNeyBigrams(documents: DataFrame, minCount: Long = 10,
                       discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1,
      s"discount must be in (0,1), got $discount")
    val pairs = documents.select(toks.as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS a, t[i+1] AS b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    // the bigram table feeds four consumers (result, both context
    // rollups, the type total) — checkpoint it so the corpus-sized pair
    // extraction runs ONCE, not once per consumer
    val big = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      .localCheckpoint()
    val left = big.groupBy(col("a")).agg(
      sum(col("n_ab")).as("c_a"), count(lit(1)).as("n1p_a"))
    val right = big.groupBy(col("b")).agg(count(lit(1)).as("n1p_b"))
    val types = big.agg(count(lit(1)).as("n_types"))
    val pkn =
      greatest(col("n_ab").cast("double") - lit(discount), lit(0.0)) /
        col("c_a").cast("double") +
      lit(discount) * col("n1p_a").cast("double") / col("c_a").cast("double") *
        (col("n1p_b").cast("double") / col("n_types").cast("double"))
    big.filter(col("n_ab") >= minCount)
      .join(left, "a").join(right, "b")
      .crossJoin(broadcast(types))
      .select(col("a"), col("b"), col("n_ab"), col("c_a"),
        col("n1p_a"), col("n1p_b"), portableRound(pkn, 6).as("p_kn"))
  }

  /** Per-document unigram-LM surprisal — the CCNet-style fluency signal:
    * score every document by the mean negative log Laplace-smoothed
    * unigram probability of its tokens under a model fit on the corpus
    * itself (gibberish and rare-token soup scores high, plain prose low).
    *
    * Shape: one token-count aggregation, one join of the token stream
    * back to the counts on the token key (same partitioning), one per-doc
    * aggregation. Per-token surprisals are rounded then summed as exact
    * decimals, so the per-doc mean is independent of accumulation order. */
  def unigramSurprisal(documents: DataFrame): DataFrame = {
    val tokStream = documents.select(col("doc_id"), explode(toks).as("tok"))
    val counts = tokStream.groupBy(col("tok")).agg(count(lit(1)).as("n_w"))
    val totals = counts.agg(sum(col("n_w")).as("n_total"),
      count(lit(1)).as("v_size"))
    val surp = portableRound(
      -log((col("n_w") + 1).cast("double") / (col("n_total") + col("v_size")).cast("double")), 6)
    tokStream.join(counts, "tok")
      .crossJoin(broadcast(totals))
      .withColumn("surp", surp)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        portableRound(sum(col("surp").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 4).as("avg_surprisal"))
  }

  /** CANARY1 — secret-sharer canary exposure (Carlini et al., USENIX
    * Security 2019): plant a unique canary sequence into the training
    * corpus `k` times, score it against `nCands−1` never-inserted
    * control candidates of the same format under the trained LM, and
    * report its rank, exposure = log2(nCands/rank), and the score
    * MARGIN to the best control — per insertion level k. The
    * memorization probe a privacy review runs before releasing a model
    * trained on the corpus.
    *
    * Honest scope note: under this engine-replayable unigram "model"
    * detection is THRESHOLD-shaped — any k ≥ 1 drops the true canary's
    * token surprisal below every control's smoothing ceiling, so rank
    * is 1 (exposure log2 nCands) for every inserted level and the k = 0
    * negative-control family ranks dead last by construction (its true
    * canary is given the LARGEST candidate id, so the all-tied family
    * breaks against it). That binarity is itself the finding n-gram
    * memorization gives you — it is WHY exact dedup removes copies —
    * while the k-DEPENDENCE lives in the margin column, which grows as
    * ln(k+1). A graded rank curve needs a neural LM; the plumbing
    * (candidate families, rank, exposure, margin) is model-agnostic.
    *
    * Scale shape: the corpus appears only in the term count; candidate
    * scoring is a (nCands × tokens)-row literal frame joined against
    * the vocab (broadcast), then per-family rank windows over nCands
    * rows. Bill = the term count + the tiny candidate rollups. */
  def canaryExposure(train: DataFrame, candidates: DataFrame,
                     nCands: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = train.select(explode(toks).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_w"))
    val totals = counts.agg(sum(col("n_w")).as("n_total"),
      count(lit(1)).as("v_size"))
    val surp = portableRound(
      -log((coalesce(col("n_w"), lit(0L)) + 1).cast("double")
        / (col("n_total") + col("v_size")).cast("double")), 6)
    val scored = candidates
      .select(col("k"), col("cand_id"), col("is_true"),
        explode(split(col("text"), " ")).as("tok"))
      .join(counts, Seq("tok"), "left")
      .crossJoin(broadcast(totals))
      .select(col("k"), col("cand_id"), col("is_true"),
        portableRound(surp * 1000000.0, 0).cast("long").as("m"))
      .groupBy(col("k"), col("cand_id"), col("is_true"))
      .agg(portableRound(sum(col("m")).cast("double")
        / count(lit(1)) / 1000000.0, 4).as("score"))
      .localCheckpoint() // consumers: rank window + the control stats
    val w = Window.partitionBy(col("k"))
      .orderBy(col("score").asc, col("cand_id").asc)
    val ranked = scored.withColumn("rk", row_number().over(w))
      .filter(col("is_true"))
      .select(col("k"), col("score").as("true_score"),
        col("rk").cast("long").as("rank"))
    val controls = scored.filter(!col("is_true"))
      .groupBy(col("k"))
      .agg(min(col("score")).as("min_control"),
        portableRound(sum(portableRound(col("score") * 10000.0, 0)
          .cast("long")).cast("double") / 10000.0 / count(lit(1)), 4)
          .as("mean_control"))
    ranked.join(controls, "k")
      .select(col("k"), col("true_score"), col("mean_control"),
        col("min_control"),
        portableRound(col("min_control") - col("true_score"), 4)
          .as("margin"),
        col("rank"),
        portableRound(
          log(lit(nCands.toDouble) / col("rank")) / log(lit(2.0)), 4)
          .as("exposure"),
        (col("min_control") - col("true_score") > 0.05).as("detected"))
  }

  /** TYPO1 — spell-noise audit via the SymSpell deletion-neighborhood
    * join (Garbe's symmetric-delete algorithm): a RARE vocabulary token
    * (count ≤ `rareMax`) is a typo candidate when a ≥ `ratio`×-more-
    * frequent token (count ≥ `freqMin`) sits at edit distance exactly 1;
    * report each with its best correction (highest count, ties
    * lexicographic). The OCR/typo noise-rate signal a crawl-quality
    * pipeline reads before deciding whether to normalize or drop.
    *
    * Scale shape: everything runs on the VOCAB frame (distinct tokens +
    * counts), never the token stream — and candidates come from joining
    * {token} ∪ its 1-deletion variants on both sides (a pair is at
    * distance ≤ 1 iff those key sets intersect), then verifying with
    * one `levenshtein` call per CANDIDATE. Vocab² never materializes:
    * the join is keyed on deletion variants (|token|+1 keys per vocab
    * row), which is how SymSpell makes spelling correction linear in
    * vocabulary where the naive form is quadratic. The oracle checks
    * the same SET via all-pairs `levenshtein` — same answer, the plan
    * only the engine needs. */
  def spellNoise(documents: DataFrame, rareMax: Long = 3,
                 freqMin: Long = 10, ratio: Long = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vocab = documents.select(explode(toks).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // two consumers: the rare and frequent sides
    def withKeys(df: DataFrame, pre: String) = df.select(
        col("tok").as(s"${pre}tok"), col("cnt").as(s"${pre}cnt"),
        explode(array_distinct(concat(array(col("tok")),
          transform(sequence(lit(1), length(col("tok"))),
            i => concat(col("tok").substr(lit(1), i - 1),
              col("tok").substr(i + 1, length(col("tok")))))))).as("k"))
    val rare = withKeys(vocab.filter(col("cnt") <= rareMax), "r_")
    val freq = withKeys(vocab.filter(col("cnt") >= freqMin), "f_")
    val cand = rare.join(freq, "k")
      .filter(col("r_tok") =!= col("f_tok") &&
        col("f_cnt") >= col("r_cnt") * ratio)
      .select(col("r_tok"), col("r_cnt"), col("f_tok"), col("f_cnt"))
      .distinct()
      .filter(levenshtein(col("r_tok"), col("f_tok")) === 1)
    val w = Window.partitionBy(col("r_tok"))
      .orderBy(col("f_cnt").desc, col("f_tok").asc)
    cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("r_tok").as("token"), col("r_cnt").as("token_count"),
        col("f_tok").as("correction"), col("f_cnt").as("correction_count"))
  }

  /** MINK1 — Min-K% Prob membership inference (Shi et al., ICLR 2024):
    * score every probe document by the mean surprisal of its `frac`
    * most-surprising tokens under a model trained on `train` — members
    * of the training set lack the high-surprisal outlier tokens an
    * external document carries, so the top-k tail separates member from
    * non-member far more sharply than the full mean (lm1's score, also
    * reported for contrast). The probabilistic sibling of mem1's n-gram
    * set novelty: same leakage question, likelihood- instead of
    * membership-based. The "model" is lm1's add-1-smoothed unigram LM —
    * the engine-replayable stand-in for the production LM; UNSEEN probe
    * tokens take the -ln(1/(N+V)) ceiling (the left-join leg lm1's
    * in-corpus scoring never needs).
    *
    * Determinism: surprisals on the 1e-6 grid as micro-unit BIGINTs,
    * per-doc top-k by a sorted in-row array slice (tie order
    * irrelevant to a sum), class means micro-exact — FULL oracle.
    *
    * Scale shape: the train-side term count (vocab-keyed, map-side
    * combinable), the probe token join (vocab side broadcasts; flips
    * to a tok-keyed shuffle join at real vocab scale), the per-doc
    * rollup, and the 2-row class rollup. Per-doc state is one
    * token-count-sized array — the same bound as the text itself. */
  def minKMembership(train: DataFrame, probe: DataFrame,
                     frac: Double = 0.2): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0, 1]: $frac")
    val counts = train.select(explode(toks).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_w"))
    val totals = counts.agg(sum(col("n_w")).as("n_total"),
      count(lit(1)).as("v_size"))
    val surp = portableRound(
      -log((coalesce(col("n_w"), lit(0L)) + 1).cast("double")
        / (col("n_total") + col("v_size")).cast("double")), 6)
    val micro = portableRound(surp * 1000000.0, 0).cast("long")
    val perDoc = probe
      .select(col("doc_id"), col("is_member"), explode(toks).as("tok"))
      .join(counts, Seq("tok"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("is_member"), micro.as("m"))
      .groupBy(col("doc_id"), col("is_member"))
      .agg(sort_array(collect_list(col("m")), asc = false).as("ms"),
        count(lit(1)).as("n"))
      .withColumn("k", ceil(col("n") * frac).cast("int"))
      .select(col("is_member"),
        portableRound(
          aggregate(slice(col("ms"), lit(1), col("k")), lit(0L), _ + _)
            .cast("double") / col("k") / 1000000.0, 4).as("mink"),
        portableRound(
          aggregate(col("ms"), lit(0L), _ + _)
            .cast("double") / col("n") / 1000000.0, 4).as("fullm"))
    def microMean(c: org.apache.spark.sql.Column) = portableRound(
      sum(portableRound(c * 10000.0, 0).cast("long")).cast("double")
        / 10000.0 / count(lit(1)), 4)
    perDoc.groupBy(col("is_member"))
      .agg(count(lit(1)).as("n_docs"),
        microMean(col("mink")).as("mean_mink"),
        microMean(col("fullm")).as("mean_surprisal"))
  }

  /** CCNet-style perplexity partition (Wenzek et al. 2020): bucket every
    * document into head / middle / tail WITHIN ITS LANGUAGE by
    * unigram-LM surprisal tertiles — the canonical crawl-quality
    * partition (keep head, sample middle, drop tail). Tertiles are
    * rank-exact (bucket = 1 + ((rank−1)·3) div n, ranks tie-broken on
    * doc_id), not approximate quantiles, so the cut is deterministic
    * and the oracle replays it digit-exact.
    *
    * Shape: [[unigramSurprisal]]'s two token exchanges (term counts,
    * doc rollup) + one doc_id join + ONE per-language window — keyed,
    * never global; language cardinality bounds window skew, and at
    * 100 TB each language's rank partition streams independently. */
  def perplexityBuckets(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = unigramSurprisal(documents)
      .join(documents.select(col("doc_id"), col("lang")), "doc_id")
    val grp = Window.partitionBy(col("lang"))
    scored
      .withColumn("rn", row_number().over(
        grp.orderBy(col("avg_surprisal").asc, col("doc_id").asc)).cast("long"))
      .withColumn("n", count(lit(1)).over(grp))
      .withColumn("bucket_id", (expr("((rn - 1) * 3) div n") + 1).cast("int"))
      .withColumn("bucket",
        when(col("bucket_id") === 1, "head")
          .when(col("bucket_id") === 2, "middle").otherwise("tail"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("avg_surprisal"), col("bucket_id"), col("bucket"))
  }

  /** Tokenizer fertility by language — the standard per-language
    * tokenizer-evaluation table (pieces per whitespace word under the
    * trained BPE): high-fertility languages pay more sequence length per
    * word, the number that drives multilingual vocab-size decisions.
    * One rollup over [[bpeEncodeStats]]'s per-doc encode (the trained
    * merge table stays codebook-sized driver state; the corpus bills the
    * same two scans bpe2 bills — this adds one lang-keyed aggregation). */
  def bpeFertilityByLang(docs: DataFrame, merges: Int): DataFrame =
    bpeEncodeStats(docs, merges)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_pieces")).as("n_pieces"),
        portableRound(sum(col("n_pieces")).cast("double") /
          sum(col("n_words")).cast("double"), 4).as("fertility"))

  /** Vocabulary coverage / out-of-vocabulary rate by source under a
    * top-`vocabK` frequency vocab — the second standard tokenizer-eval
    * table beside [[bpeFertilityByLang]]: which ingest sources a fixed
    * vocab serves worst (high OOV = that source pays UNK mass or byte
    * fallback). Vocab selection is deterministic (count desc, token asc).
    *
    * Shape: one vocab-sized token rollup + TakeOrdered(K), the K-row
    * vocab BROADCAST back over the token stream (left join marks OOV
    * in-row), one map-side-combinable source rollup. The corpus bills
    * two streamed passes; nothing corpus-sized shuffles. */
  def oovRateBySource(documents: DataFrame, vocabK: Int = 16): DataFrame = {
    require(vocabK >= 1, s"vocabK must be >= 1, got $vocabK")
    val tokStream = documents.select(col("source"), explode(toks).as("tok"))
      .filter(length(col("tok")) > 0)
    val vocab = tokStream.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc).limit(vocabK)
      .select(col("tok"), lit(1).as("in_vocab"))
    tokStream.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"),
        countDistinct(when(col("in_vocab").isNull, col("tok")))
          .as("n_oov_types"))
      .withColumn("oov_rate",
        portableRound(col("n_oov").cast("double") /
          col("n_tokens").cast("double"), 4))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        col("n_oov_types"), col("oov_rate"))
  }

  /** Heaps'-law vocabulary-growth audit (zipf1's companion corpus
    * statistic): cumulative vocabulary size at doc-rank checkpoints
    * 1, 2, 4, …, with the fitted growth exponent β from log V = log K +
    * β·log T. A natural crawl reads β ≈ 0.4–0.6; **β ≈ 0 flags a
    * closed/saturated vocabulary** (template spam, synthetic text, a
    * truncated tokenizer) — which is exactly what it measures on the
    * 31-type fixture. Checkpoints are doc-rank-exact (the deterministic
    * ingest ordinal), so the whole curve replays in the oracle.
    *
    * Shape: [[graft.etl.Transform.withIngestOrder]]'s partition-offset
    * ordinal (NO global window), one token first-occurrence rollup, and
    * a log₂(n)-factor explode (each doc/token contributes to the ≤ 2·log n
    * checkpoints at or after it) into one keyed rollup; the OLS fit runs
    * on the ≤ 63-row checkpoint frame. */
  def heapsLaw(documents: DataFrame): DataFrame = {
    val docs = documents.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_toks"))
    val ordered = graft.etl.Transform.withIngestOrder(docs, "doc_id")
      .select(col("doc_id"), col("n_toks"),
        col("ingest_order").cast("long").as("ord"))
      .localCheckpoint()
    val n = ordered.count()
    require(n >= 2, s"heapsLaw needs >= 2 documents, got $n")
    val ks = (0 to 62).map(1L << _).filter(_ <= n)
    val ckArr = array(ks.map(lit): _*)
    val tCounts = ordered
      .withColumn("ck", explode(filter(ckArr, c => c >= col("ord"))))
      .groupBy(col("ck")).agg(sum(col("n_toks")).as("n_tokens"))
    val firstOrd = documents
      .select(col("doc_id"), explode(toks).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(min(col("doc_id")).as("first_doc"))
      .join(ordered.select(col("doc_id").as("first_doc"), col("ord")),
        "first_doc")
    val vCounts = firstOrd
      .withColumn("ck", explode(filter(ckArr, c => c >= col("ord"))))
      .groupBy(col("ck")).agg(count(lit(1)).as("vocab"))
    val pts = tCounts.join(vCounts, "ck")
      .withColumn("x", portableRound(log(col("n_tokens").cast("double")), 9))
      .withColumn("y", portableRound(log(col("vocab").cast("double")), 9))
    def dsum(c: org.apache.spark.sql.Column) =
      sum(portableRound(c, 9).cast("decimal(28,9)")).cast("double")
    val fit = pts.agg(count(lit(1)).cast("double").as("np"),
        dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
        dsum(col("x") * col("x")).as("sxx"),
        dsum(col("x") * col("y")).as("sxy"))
      .select(when(col("np") * col("sxx") - col("sx") * col("sx") > 0,
        portableRound((col("np") * col("sxy") - col("sx") * col("sy")) /
          (col("np") * col("sxx") - col("sx") * col("sx")), 6))
        .otherwise(0.0).as("beta"))
    pts.crossJoin(broadcast(fit))
      .select(col("ck").as("ck_docs"), col("n_tokens"), col("vocab"),
        col("beta"))
  }

  /** Okapi BM25 relevance of every document against a fixed query-term
    * set — the retrieval scorer a decontamination / curation pipeline runs
    * to find eval-set-like or topic-targeted documents in the corpus
    * (t7's tf-idf generalized with the saturation and length
    * normalization that made BM25 the lexical-retrieval default).
    * Per term: idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (the
    * non-negative Robertson–Spärck Jones form), and the doc contribution
    * tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)).
    *
    * Shape: corpus stats (N, total tokens, one df per term) are ONE
    * 1-row aggregate broadcast to a single data-sized projection — no
    * per-term join, no inverted index needed because the query is fixed
    * and tiny. Term contributions are summed in fixed query order, so the
    * double result is reproducible; only the final score is rounded. */
  def bm25(documents: DataFrame,
           terms: Seq[String] = Seq("spark", "join", "vector"),
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(terms.forall(t => t.nonEmpty && !t.contains("'") && !t.contains(" ")),
      s"terms must be single quoteless tokens: $terms")
    val statAggs =
      count(lit(1)).as("n_docs") +:
        sum(size(toks).cast("long")).as("tot_tokens") +:
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(toks, t), 1L).otherwise(0L)).as(s"df_$i")
        }
    val stats = documents.agg(statAggs.head, statAggs.tail: _*)
    val dl = size(toks).cast("double")
    val avgdl = col("tot_tokens").cast("double") / col("n_docs").cast("double")
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = expr(s"size(filter(split(text, ' '), x -> x = '$t'))").cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs").cast("double") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5))
      idf * (tf * (k1 + 1.0)) / (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / avgdl))
    }.reduce(_ + _)
    documents.crossJoin(broadcast(stats))
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
        portableRound(score, 4).as("bm25"))
  }

  /** Hashing-trick bag-of-words features: every token maps to a fixed
    * dimension by the engine-portable md5 bucket, emitted as sparse
    * (doc_id, dim, weight) triples — the linear-model/embedding-free
    * featurization that needs NO vocabulary pass, no dictionary state,
    * and a fixed output width however large the corpus grows (the
    * Weinberger et al. hashing trick). Collisions are the accepted
    * trade; `dims` sets the collision/width balance.
    *
    * Shape: one explode + one (doc, dim) hash aggregation — map-side
    * combinable, no broadcast, no second pass; the triple form keeps the
    * output schema hashable by the oracle (and a downstream `collect_list`
    * turns it into vectors without re-scanning text). */
  def featureHash(documents: DataFrame, dims: Int = 64): DataFrame = {
    require(dims >= 2 && dims <= 100000, s"dims out of range: $dims")
    // Hash straight into `dims` buckets (no intermediate mod-10000 pass:
    // a double mod would leave dims >= 10000 unreachable and bias
    // non-divisor widths). Residual bias is only 2^32 % dims over the
    // 32-bit md5 prefix — exactly zero for power-of-two dims, < 1e-5
    // relative for the allowed range.
    documents.select(col("doc_id"), explode(toks).as("token"))
      .select(col("doc_id"), Sampling.hashBucket(col("token"), dims).as("dim"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(count(lit(1)).as("weight"))
  }

  /** In-engine TRAINED language-ID — the model the t1 heuristic stands in
    * for: one hashed-bag-of-words logistic head per class (one-vs-rest
    * over a caller-declared label space, the fixed production model-head
    * contract — like [[Privacy.privateGroupCounts]]' public domain, the
    * class list is part of the interface, not sniffed from data), trained
    * by [[Analytics.logisticGdVector]]'s full-batch GD, and scored into a
    * lid1-shaped confusion matrix against the ground-truth labels.
    *
    * Features are [[featureHash]]'s trick applied dense: token counts
    * hashed into `dims` buckets by the engine-portable md5 bucket,
    * normalized by the document's token count, plus an intercept — no
    * vocabulary pass, fixed width at any corpus size. Training follows
    * ml1's bit-exact discipline (micro-unit BIGINT gradient folds,
    * 1e-6-grid coefficient snaps), predictions take the arg-max of
    * 1e-6-snapped sigmoids with first-wins ties in class-list order — so
    * the DuckDB oracle replays the ENTIRE pipeline (featurize → classes ×
    * iters GD steps → score → confuse) digit for digit.
    *
    * Scale shape: one explode + ONE (doc, label) hash aggregation builds
    * the feature frame (map-side combinable, checkpointed once — classes
    * × iters aggregates re-read it, never the corpus); per iteration ONE
    * 1-row aggregate; driver state = classes × (dims+1) coefficients.
    * Scoring is one projection + a |classes|²-cell aggregate. */
  def langTrainConfusion(documents: DataFrame, classes: Seq[String],
                         dims: Int = 16, iters: Int = 3,
                         lr: Double = 2.0): DataFrame = {
    require(classes.nonEmpty && classes.distinct == classes,
      "classes must be non-empty and distinct")
    require(dims >= 2 && dims <= 1024, s"dims out of range: $dims")
    val k = dims + 1
    // dense featurization as ONE compiled kernel projection (per-token
    // md5 bucket counts, the same buckets Sampling.hashBucket computes) —
    // no explode, no exchange; the earlier explode → (doc, label) hash
    // aggregation form paid one corpus-token-sized shuffle for the same
    // vectors
    val feat = documents
      .select(col("doc_id"), col("lang"),
        nTokensExpr.cast("double").as("_nt"),
        graft.functions.hashed_bag_counts(col("text"), dims).as("_c"))
      .select(Seq(col("doc_id"), col("lang"), lit(1.0).as("x0")) ++
        (0 until dims).map(j =>
          (element_at(col("_c"), j + 1).cast("double") / col("_nt"))
            .as(s"x${j + 1}")): _*)
      .localCheckpoint()
    // classes × (dims+1) driver-held coefficients — the model head.
    // All heads train in ONE aggregate per iteration (each class's
    // micro-unit gradient sums are independent, so batching changes job
    // count, not arithmetic — the per-class trajectory is bit-identical
    // to logisticGdVector's): iters corpus-frame scans total instead of
    // classes × iters, which is also the 100 TB shape (one pass fans out
    // to every head's partial sums map-side).
    def micro(c: org.apache.spark.sql.Column) =
      floor(c * 1000000.0 + 0.5).cast("long")
    var betas: Seq[(String, Array[Double])] =
      classes.map(_ -> Array.fill(k)(0.0))
    for (_ <- 1 to iters) {
      val aggs = count(lit(1)).as("n") +: betas.flatMap { case (c, b) =>
        val z = (0 until k).map(j => lit(b(j)) * col(s"x$j")).reduce(_ + _)
        val sg = lit(1.0) / (lit(1.0) + exp(-z))
        val y = when(col("lang") === c, 1.0).otherwise(0.0)
        (0 until k).map(j => sum(micro((sg - y) * col(s"x$j"))).as(s"g_${c}_$j"))
      }
      val a = feat.agg(aggs.head, aggs.tail: _*).head
      val n = a.getLong(0).toDouble
      require(n > 0, "langTrainConfusion needs a non-empty corpus")
      betas = betas.zipWithIndex.map { case ((c, b), ci) =>
        c -> Array.tabulate(k) { j =>
          val g = a.getLong(1 + ci * k + j)
          math.floor((b(j) - lr * (g.toDouble / 1000000.0 / n))
            * 1000000.0 + 0.5) / 1000000.0
        }
      }
    }
    def r6(c: org.apache.spark.sql.Column) =
      floor(c * 1000000.0 + 0.5) / 1000000.0
    val scoreCols = betas.map { case (c, b) =>
      val z = (0 until k).map(j => lit(b(j)) * col(s"x$j")).reduce(_ + _)
      r6(lit(1.0) / (lit(1.0) + exp(-z))).as(s"_s_$c")
    }
    // arg-max with first-wins ties in class-list order (scores sit on the
    // 1e-6 grid, so ties are engine-identical)
    val pred = classes.zipWithIndex.foldRight(
      lit(classes.last): org.apache.spark.sql.Column) { case ((c, i), rest) =>
      if (i == classes.size - 1) rest
      else {
        val wins = classes.drop(i + 1)
          .map(o => col(s"_s_$c") >= col(s"_s_$o")).reduce(_ && _)
        when(wins, c).otherwise(rest)
      }
    }
    val scored = feat.select(col("lang") +: scoreCols: _*)
      .withColumn("pred_lang", pred)
    val cells = scored.groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("lang")).agg(sum(col("n")).as("_t"))
    cells.join(totals, "lang")
      .select(col("lang"), col("pred_lang"), col("n"),
        portableRound(col("n").cast("double") / col("_t").cast("double"), 4)
          .as("class_share"))
  }

  /** NDCG@k of the [[bm25]] ranking against a term-coverage relevance
    * label (gain = number of distinct query terms a document contains) —
    * the retrieval-quality readout a curation pipeline runs to check its
    * lexical scorer before trusting it to mine eval-like documents.
    * DCG@k = Σ (2^gain − 1)/log2(pos+1) over the top-k by (bm25 desc,
    * doc_id); the ideal ranking sorts by gain directly.
    *
    * Determinism: gains and 2^gain − 1 are exact integers (shiftleft, no
    * float pow), positions come from total orders, discount terms are
    * rounded then decimal-summed, and the final ratio is one IEEE
    * division. The rank windows run on the scored frame (top-k sized
    * work at the TakeOrdered level at scale — same contract as w6). */
  def ndcgAtK(documents: DataFrame,
              terms: Seq[String] = Seq("spark", "join", "vector"),
              k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val gain = terms.map(t =>
      array_contains(toks, t).cast("int")).reduce(_ + _).cast("long")
    val scored = bm25(documents, terms)
      .join(documents.select(col("doc_id"), gain.as("gain")), "doc_id")
    val byScore = Window.orderBy(col("bm25").desc, col("doc_id"))
    val byGain = Window.orderBy(col("gain").desc, col("doc_id"))
    // Both ranks in ONE pass over `scored` (it embeds the bm25 stats
    // broadcast and the per-term projections — executing it twice would
    // double the data-sized scan): two row_numbers on the same frame,
    // then one aggregation with the top-k filters as conditional sums.
    def term(pos: org.apache.spark.sql.Column): org.apache.spark.sql.Column = portableRound(
      expr("shiftleft(1, cast(gain as int)) - 1").cast("double") /
        log2(pos.cast("double") + 1.0), 8)
      .cast("decimal(18,8)")
    scored
      .withColumn("pos_score", row_number().over(byScore))
      .withColumn("pos_gain", row_number().over(byGain))
      .agg(
        sum(when(col("pos_score") <= k, term(col("pos_score")))).as("dcg"),
        sum(when(col("pos_gain") <= k, term(col("pos_gain")))).as("idcg"))
      .select(
        portableRound(col("dcg").cast("double"), 4).as(s"dcg_$k"),
        portableRound(col("idcg").cast("double"), 4).as(s"idcg_$k"),
        when(col("idcg") > 0,
          portableRound(col("dcg").cast("double") / col("idcg").cast("double"), 4))
          .otherwise(0.0).as(s"ndcg_$k"))
  }

  /** BPE tokenizer-merge training (Sennrich et al. 2016, the public
    * subword algorithm): learn the first `merges` byte-pair merges over
    * the corpus — the data-side half of training a tokenizer, which a
    * pretraining pipeline runs BEFORE tokenizing 100 TB.
    *
    * Structure is the reason this is cheap at scale: the corpus is
    * scanned ONCE (a word-frequency groupBy — the only corpus-sized
    * job); every merge iteration then works on the VOCAB table (distinct
    * words + counts — ~10⁵-10⁶ rows at any corpus size). Symbol
    * sequences ride as delimited strings (` a  b  c `: single sentinel
    * spaces at the ends, double between symbols), so
    *   - adjacent-pair counting is a slice/zip/explode over the split,
    *   - applying merge (l, r) is ONE literal `replace(' l  r ', ' lr ')`
    *     whose sequential non-overlapping semantics exactly reproduce
    *     BPE's greedy left-to-right merge (` a  a  a  a ` → ` aa  aa `,
    *     the overlap case, works because each match consumes its
    *     trailing sentinel so the next pair anchors correctly),
    *   - the SAME string ops exist verbatim in DuckDB, so the oracle
    *     replays every iteration digit-exact with zero float anywhere.
    * The per-iteration driver state is one (left, right, count) row —
    * codebook-sized, the kmeans/ml1 contract; ties break
    * lexicographically so the argmax is total.
    *
    * Emits one row per learned merge: rank, left, right, merged symbol,
    * weighted pair count.
    *
    * Exhaustion contract: if the corpus runs out of adjacent pairs before
    * `merges` iterations, the loop THROWS rather than returning a short
    * table — intentional, because the DuckDB oracle unrolls exactly
    * `merges` stages and a silently-shorter vocabulary would let an
    * under-provisioned corpus masquerade as a trained tokenizer. Callers
    * wanting best-effort semantics should pass
    * `merges <= distinct-char-pair capacity` of their corpus (standard
    * BPE implementations stop early; this one is a fixed-budget trainer
    * by design). */
  def bpeTrain(docs: DataFrame, merges: Int): DataFrame = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    val spark = docs.sparkSession
    // corpus pass: ONE groupBy to the word-frequency (vocab) table, then
    // chars → sentinel-delimited symbol string; checkpointed because all
    // `merges` iterations re-read it (vocab-sized, not corpus-sized)
    var vocab = docs.select(explode(toks).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(regexp_replace(col("w"), "(.)", " $1 ").as("seq"), col("freq"))
      .localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    for (t <- 1 to merges) {
      val syms = split(trim(col("seq")), "  ")
      val pairs = vocab
        .select(col("freq"),
          slice(syms, lit(1), size(syms) - 1).as("a"),
          slice(syms, lit(2), size(syms) - 1).as("b"))
        .select(col("freq"), explode(arrays_zip(col("a"), col("b"))).as("pr"))
        .select(col("freq"), col("pr.a").as("l"), col("pr.b").as("r"))
      val top = pairs.groupBy(col("l"), col("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      require(top.nonEmpty, s"no adjacent pairs left at merge $t")
      val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      learned += ((t.toLong, l, r, l + r, cnt))
      vocab = vocab
        .withColumn("seq",
          replace(col("seq"), lit(s" $l  $r "), lit(s" ${l + r} ")))
        .localCheckpoint()
    }
    import spark.implicits._
    learned.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Unigram-LM tokenizer training (the SentencePiece family's other
    * half, next to [[bpeTrain]]'s merge-based one): seed a substring
    * vocabulary from the corpus, then run Viterbi-EM — each round
    * segments every distinct word into the piece sequence of minimum
    * total cost under the current model (cost = micro-unit −ln p, an
    * exact BIGINT, so the DP is pure integer arithmetic), folds hard
    * piece counts weighted by word frequency, and re-estimates piece
    * probabilities from the counts. Emits the final vocabulary:
    * (piece, piece_len, cnt, p6).
    *
    * Determinism, engineered like ml1/kmeans1/bpe1: the seed is all
    * single characters plus the top (seedSize − #chars) multi-character
    * substrings by (weighted count desc, piece asc); DP ties prefer the
    * longer piece; counts fold as BIGINTs; probabilities snap through the
    * micro-unit cost grid each round. Single characters keep a count
    * floor of 1 (character coverage — every word stays segmentable);
    * unused multi-character pieces drop out (the SentencePiece prune).
    * The DuckDB oracle replays seed → unrolled set-based DP → recursive
    * backtrace → count folds → re-estimation for every EM round, digit
    * for digit.
    *
    * Scale shape: ONE corpus pass (the word-frequency groupBy); all EM
    * work runs on the DISTINCT-WORD table with the model as a broadcast
    * reference object inside a compiled per-word kernel
    * ([[graft.functions.UnigramViterbiPieces]]) — exactly how production
    * tokenizers train at 100 TB (vocab-keyed segmentation, never
    * per-corpus-token work). Driver state is the ≤ seedSize-row model
    * head, the kmeans-codebook contract. `maxWordLen` bounds the
    * oracle's DP unroll; the trainer fails loudly if the corpus exceeds
    * it (words longer than the bound would silently vanish from a
    * fixed-depth replay). */
  def unigramTrain(docs: DataFrame, seedSize: Int = 40, maxPieceLen: Int = 4,
                   emIters: Int = 2, maxWordLen: Int = 12): DataFrame = {
    val vocab = unigramTrainModel(docs, seedSize, maxPieceLen, emIters, maxWordLen)
    val total = vocab.map(_._2).sum.toDouble
    val rows = vocab.toSeq.map { case (p, c) =>
      (p, p.length.toLong, c, math.floor(c / total * 1000000.0 + 0.5) / 1000000.0)
    }
    val spark = docs.sparkSession
    import spark.implicits._
    rows.toDF("piece", "piece_len", "cnt", "p6")
  }

  /** Micro-unit −ln p costs of a (piece, count) vocabulary — shared by
    * the trainer's EM rounds and [[unigramEncodeStats]]' final pass. */
  private def unigramCostsOf(v: Array[(String, Long)]): Seq[(String, Long)] = {
    val total = v.map(_._2).sum.toDouble
    v.toSeq.map { case (p, c) =>
      (p, -math.floor(math.log(c / total) * 1000000.0 + 0.5).toLong) }
  }

  /** The [[unigramTrain]] loop, returning the final (piece, count) model
    * head instead of a frame — the encode half re-uses it. */
  private[operators] def unigramTrainModel(docs: DataFrame, seedSize: Int,
                                           maxPieceLen: Int, emIters: Int,
                                           maxWordLen: Int): Array[(String, Long)] = {
    require(seedSize >= 2, s"seedSize must be >= 2, got $seedSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(emIters >= 1, s"emIters must be >= 1, got $emIters")
    val words = docs.select(explode(toks).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    val wlRow = words.agg(max(length(col("w")))).head
    require(!wlRow.isNullAt(0),
      "unigramTrain: corpus has no non-empty words — nothing to train on")
    val wl = wlRow.getInt(0)
    require(wl <= maxWordLen,
      s"longest word ($wl chars) exceeds the DP unroll bound $maxWordLen")
    val sub = (1 to maxPieceLen).map { l =>
      words.filter(length(col("w")) >= l)
        .select(explode(expr(
          s"transform(sequence(1, length(w) - ${l - 1}), i -> substr(w, i, $l))"))
          .as("piece"), col("freq"))
    }.reduce(_ unionByName _)
    val seedCnt = sub.groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      .localCheckpoint()
    val charPieces = seedCnt.filter(length(col("piece")) === 1)
    val nChars = charPieces.count()
    require(seedSize > nChars,
      s"seedSize $seedSize must exceed the $nChars single characters")
    val multi = seedCnt.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit((seedSize - nChars).toInt)
    // the model head: ≤ seedSize (piece, count) rows of driver state
    var vocab = charPieces.unionByName(multi)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    for (_ <- 1 to emIters) {
      val segCol = graft.functions.unigram_viterbi_pieces(
        col("w"), unigramCostsOf(vocab), maxPieceLen)
      val counted = words.select(explode(segCol).as("piece"), col("freq"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val chars = vocab.map(_._1).filter(_.length == 1)
      vocab = (counted.keySet ++ chars).toSeq.sorted.map { p =>
        val c = counted.getOrElse(p, 0L)
        (p, if (p.length == 1) math.max(c, 1L) else c)
      }.filter(_._2 > 0).toArray
    }
    vocab
  }

  /** UNIGRAM ENCODE — the apply half of [[unigramTrain]], mirroring
    * [[bpeEncodeStats]] for the merge-free tokenizer family: segment the
    * corpus under the TRAINED unigram model (one extra Viterbi pass with
    * the final costs) and report per-document piece statistics. The
    * decisive scale property is identical to bpe2's: segmentation runs
    * on the DISTINCT-WORD table only (the compiled DP kernel with the
    * broadcast model), and the corpus pays ONE broadcast word→count join
    * plus a per-doc aggregate. */
  def unigramEncodeStats(docs: DataFrame, seedSize: Int = 40,
                         maxPieceLen: Int = 4, emIters: Int = 2,
                         maxWordLen: Int = 12): DataFrame = {
    val vocab = unigramTrainModel(docs, seedSize, maxPieceLen, emIters, maxWordLen)
    val costs = unigramCostsOf(vocab)
    val wp = docs.select(explode(toks).as("w"))
      .filter(length(col("w")) > 0).distinct()
      .select(col("w"), size(graft.functions.unigram_viterbi_pieces(
        col("w"), costs, maxPieceLen)).cast("long").as("np"))
    docs.select(col("doc_id"), explode(toks).as("w"))
      .filter(length(col("w")) > 0)
      .join(broadcast(wp), "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("np")).as("n_pieces"))
      .select(col("doc_id"), col("n_words"), col("n_pieces"),
        portableRound(col("n_pieces").cast("double") /
          col("n_words").cast("double"), 4).as("pieces_per_word"))
  }

  /** BPE ENCODE — the apply half of [[bpeTrain]]: tokenize the corpus
    * into subword pieces under the first `merges` learned merges, and
    * report per-document piece statistics (word count, piece count,
    * pieces-per-word). The decisive scale property: merges are applied to
    * the DISTINCT-WORD table only (vocab-sized — the k chained `replace`s
    * run on ~10⁵–10⁶ rows no matter the corpus), and the corpus pays ONE
    * broadcast join word→pieces plus a per-doc count aggregate. This is
    * exactly how production tokenizers run at 100 TB: the expensive
    * segmentation is a vocab-keyed lookup, not per-token work.
    *
    * The k replaces chain in ONE projection (no per-merge materialization
    * — the vocab frame is small and the composition is a single codegen'd
    * expression); piece counts are exact integers, so the oracle replays
    * train + encode end to end. */
  def bpeEncodeStats(docs: DataFrame, merges: Int): DataFrame = {
    // driver state: the k learned (left, right) pairs — codebook-sized
    val table = bpeTrain(docs, merges).orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val words = docs.select(explode(toks).as("w"))
      .filter(length(col("w")) > 0).distinct()
    val seq0 = regexp_replace(col("w"), "(.)", " $1 ")
    val seqK = table.foldLeft(seq0) { case (acc, (l, r)) =>
      replace(acc, lit(s" $l  $r "), lit(s" ${l + r} "))
    }
    val pieces = words.select(col("w"),
      size(split(trim(seqK), "  ")).cast("long").as("n_pieces_w"))
    docs.select(col("doc_id"), explode(toks).as("w"))
      .filter(length(col("w")) > 0)
      .join(broadcast(pieces), "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces_w")).as("n_pieces"))
      .select(col("doc_id"), col("n_words"), col("n_pieces"),
        portableRound(col("n_pieces").cast("double") /
          col("n_words").cast("double"), 4).as("pieces_per_word"))
  }

  /** QF1 — a LEARNED quality filter distilled from a labeled gate: train
    * a content-only linear head (hashed bag-of-words, [[langTrainConfusion]]'s
    * featurization and ml1's exact micro-unit GD) on the gate's verdicts
    * over a hash-split train set, and report its held-out discrimination
    * (grouped Mann–Whitney AUC + 0.5-threshold confusion — ml3's exact
    * forms). This is the FineWeb-Edu move: the rule gate (or an expensive
    * LLM judge) labels a sample, the cheap distilled head scores the
    * full corpus. `labeled` carries (doc_id, text, y ∈ {0.0, 1.0}).
    *
    * Exactness: fold membership is the engine-portable md5 bucket;
    * features are per-doc hashed token counts / token count (no
    * vocabulary pass); coefficients land on the 1e-6 grid each step;
    * held-out scores snap to 1e-6 before the AUC's bounded grouped
    * cumulative window (≤ 10⁶ score groups at any corpus size) — the
    * whole pipeline replays digit-exact in the DuckDB oracle.
    *
    * Scale shape: one compiled-kernel featurize projection
    * (checkpointed; iters 1-row gradient aggregates re-read it, never
    * the corpus), one grouped-score aggregate for the eval — driver
    * state is the (dims+1)-float coefficient vector. */
  def qualityDistill(labeled: DataFrame, dims: Int = 16, iters: Int = 10,
                     lr: Double = 2.0, folds: Int = 5,
                     evalFold: Int = 4): DataFrame = {
    val (scoredDocs, nTrain) =
      distillHeldOutScores(labeled, dims, iters, lr, folds, evalFold)
    val scored = scoredDocs.select(col("y"), col("s6"))
    val g = scored.groupBy(col("s6"))
      .agg(count(lit(1)).cast("double").as("n_s"), sum(col("y")).as("pos_s"))
      .withColumn("neg_s", col("n_s") - col("pos_s"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("s6").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val contrib = g
      .withColumn("cum_neg_below", sum(col("neg_s")).over(w) - col("neg_s"))
      .select(col("pos_s"), col("neg_s"), col("n_s"),
        (col("pos_s") * (col("cum_neg_below") + col("neg_s") / 2.0)).as("c"),
        when(col("s6") >= 0.5, col("pos_s")).otherwise(col("neg_s"))
          .as("correct"))
    val nPos = sum(col("pos_s"))
    val nNeg = sum(col("n_s")) - sum(col("pos_s"))
    contrib.agg(
      sum(col("n_s")).cast("long").as("n_eval"),
      sum(col("pos_s")).cast("long").as("n_pos_eval"),
      when(nPos > 0 && nNeg > 0,
        portableRound(sum(col("c")) / (nPos * nNeg), 6))
        .otherwise(0.5).as("auc"),
      portableRound(sum(col("correct")) / sum(col("n_s")), 6).as("accuracy"))
      .withColumn("n_train", lit(nTrain))
      .select(col("n_train"), col("n_eval"), col("n_pos_eval"),
        col("auc"), col("accuracy"))
  }

  /** The featurize→standardize→train→score half of [[qualityDistill]],
    * exposed for consumers that need PER-DOC held-out probabilities (the
    * confident-learning label-noise audit): returns ((doc_id, y, s6) for
    * the eval fold, with s6 the 1e-6-snapped predicted P(y=1)) and the
    * training-fold row count. Same exactness contract as
    * [[qualityDistill]] — the whole trajectory replays digit-exact in
    * the DuckDB oracle. */
  def distillHeldOutScores(labeled: DataFrame, dims: Int = 16,
                           iters: Int = 10, lr: Double = 2.0, folds: Int = 5,
                           evalFold: Int = 4): (DataFrame, Long) = {
    require(dims >= 2 && dims <= 1024, s"dims out of range: $dims")
    require(folds >= 2 && evalFold >= 0 && evalFold < folds,
      s"need 0 <= evalFold < folds >= 2: $evalFold / $folds")
    // dense gate-signal features FIRST (length, stopword ratio, mean
    // token length — the signals a FineWeb-style filter engineers), the
    // content bag after; dup_ratio is DELIBERATELY absent, so the
    // gate's 'repetitive' arm is the head's irreducible error — the
    // held-out AUC measures recovery of the learnable arms, not a
    // feature-identity tautology
    val k = dims + 4
    val feat = labeled.select(
        col("doc_id"), col("y").cast("double").as("y"),
        graft.operators.Sampling.hashBucket(
          concat(lit("qf-fold:"), col("doc_id").cast("string")), folds)
          .as("fold"),
        least(nTokensExpr / 100.0, lit(1.0)).as("x1"),
        stopRatioExpr.as("x2"),
        least(avgTokenLenExpr / lit(10.0), lit(1.0)).as("x3"),
        nTokensExpr.cast("double").as("_nt"),
        graft.functions.hashed_bag_counts(col("text"), dims).as("_c"))
      .select(Seq(col("doc_id"), col("y"), col("fold"), lit(1.0).as("x0"),
        col("x1"), col("x2"), col("x3")) ++
        (0 until dims).map(j =>
          (element_at(col("_c"), j + 1).cast("double") / col("_nt"))
            .as(s"x${j + 4}")): _*)
      .localCheckpoint()
    // STANDARDIZE on train-fold stats before GD: the gate's sharp
    // thresholds live on tiny-variance features (stop ratio spans
    // ~0.05-0.10), where raw-scale GD needs hundreds of steps to grow
    // the weight (measured: AUC 0.49 raw vs 0.94 standardized at 10
    // steps). Stats fold as exact micro-unit BIGINTs and snap to the
    // 1e-6 grid, so the standardized features — and the whole
    // trajectory — replay digit-exact in the oracle. O(k) driver state.
    def micro(c: org.apache.spark.sql.Column) =
      floor(c * 1000000.0 + 0.5).cast("long")
    val train0 = feat.filter(col("fold") =!= evalFold)
    val statAggs = count(lit(1)).as("n") +: (1 until k).flatMap(j => Seq(
      sum(micro(col(s"x$j"))).as(s"s$j"),
      sum(micro(col(s"x$j") * col(s"x$j"))).as(s"q$j")))
    val stRow = train0.agg(statAggs.head, statAggs.tail: _*).head
    val nTr = stRow.getAs[Long]("n").toDouble
    require(nTr > 0, "qualityDistill needs a non-empty training fold")
    val stats = (1 until k).map { j =>
      val m = math.floor(stRow.getAs[Long](s"s$j").toDouble / 1000000.0 / nTr
        * 1000000.0 + 0.5) / 1000000.0
      val mean2 = stRow.getAs[Long](s"q$j").toDouble / 1000000.0 / nTr
      val sd = math.floor(math.sqrt(math.max(mean2 - m * m, 0.0))
        * 1000000.0 + 0.5) / 1000000.0
      (m, if (sd == 0.0) 1.0 else sd)
    }
    def standardized(df: DataFrame): DataFrame =
      df.select(Seq(col("doc_id"), col("y"), col("fold"), col("x0")) ++
        (1 until k).map(j =>
          ((col(s"x$j") - lit(stats(j - 1)._1)) / lit(stats(j - 1)._2))
            .as(s"x$j")): _*)
    val beta = Analytics.logisticGdVector(
      standardized(train0), k, iters, lr)
    val z = (0 until k).map(j => lit(beta(j)) * col(s"x$j")).reduce(_ + _)
    val scored = standardized(feat.filter(col("fold") === evalFold))
      .select(col("doc_id"), col("y"),
        (floor(lit(1.0) / (lit(1.0) + exp(-z)) * 1000000.0 + 0.5)
          / 1000000.0).as("s6"))
    (scored, nTr.toLong)
  }

  /** DIV1 — corpus diversity via distinct-n (Li et al. 2016's
    * generation-diversity metric run as a corpus job): per (source, n)
    * for n = 1..maxN, the n-gram instance count, the distinct n-gram
    * count and their ratio. A generated or template-heavy source reads
    * a LOW distinct ratio at n ≥ 2 long before exact dedup sees a
    * duplicate — the corpus-level twin of t9's within-doc repetition
    * flag, and the metric a synthetic-data pipeline tracks per batch.
    *
    * Grams travel as the one-pass [[graft.functions.ShingleHashes]]
    * 8-byte hashes (distinct-hash ≡ distinct-gram up to xxhash64
    * collision; the string-level oracle would catch one — dc1's
    * argument). Scale shape: one unioned explode-projection and ONE
    * two-level distinct aggregate keyed (source, n) — map-side
    * combined, output bounded by |sources| × maxN. */
  def distinctNgrams(documents: DataFrame, maxN: Int = 3): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN out of range: $maxN")
    val perN = (1 to maxN).map { n =>
      documents.select(col("source"), lit(n.toLong).as("n"),
        explode(graft.functions.shingle_hashes(col("text"), n)).as("g"))
    }.reduce(_ unionByName _)
    perN.groupBy(col("source"), col("n"))
      .agg(count(lit(1)).as("n_grams"), countDistinct(col("g")).as("n_distinct"))
      .select(col("source"), col("n"), col("n_grams"), col("n_distinct"),
        portableRound(col("n_distinct").cast("double") / col("n_grams"), 6)
          .as("distinct_ratio"))
  }

  /** CL1 — confident-learning label-noise detection (Northcutt et al.,
    * "Confident Learning", JAIR 2021) over the distilled head's held-out
    * scores: class thresholds are each class's mean self-confidence
    * (t₁ = mean P(1) over docs labeled 1; t₀ = mean P(0) over docs
    * labeled 0), and a doc is CONFIDENTLY class j when its confidence
    * for j clears tⱼ (both qualify → the larger confidence, tie → 1;
    * neither → unassigned). Off-diagonal docs — labeled i, confidently
    * j ≠ i — are the label-error candidates a curation pass re-audits.
    * Output one row per given label: doc/agree/flip/unassigned counts
    * and the class threshold.
    *
    * The scores are OUT-OF-SAMPLE by construction (the eval fold never
    * trained the head) — CL's requirement; a production pass rotates
    * the fold to cover the corpus (k such jobs, this operator unchanged).
    * Exactness: thresholds fold as micro-unit BIGINTs over grid-snapped
    * scores and land back on the 1e-6 grid, so every comparison
    * replays digit-exact in the oracle. Scale: one grouped aggregate
    * for thresholds (O(1) driver state), one projection + final
    * 2-row rollup — linear. */
  def labelNoise(scored: DataFrame): DataFrame = {
    def micro(c: org.apache.spark.sql.Column) =
      floor(c * 1000000.0 + 0.5).cast("long")
    val tRow = scored.agg(
      sum(when(col("y") === 1.0, micro(col("s6"))).otherwise(0L)).as("m1"),
      sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("n1"),
      sum(when(col("y") === 0.0, micro(lit(1.0) - col("s6"))).otherwise(0L)).as("m0"),
      sum(when(col("y") === 0.0, 1L).otherwise(0L)).as("n0")).head
    val (n1, n0) = (tRow.getAs[Long]("n1"), tRow.getAs[Long]("n0"))
    require(n1 > 0 && n0 > 0,
      s"labelNoise needs both classes in the scored set: n1=$n1 n0=$n0")
    val t1 = math.floor(tRow.getAs[Long]("m1").toDouble / n1 + 0.5) / 1000000.0
    val t0 = math.floor(tRow.getAs[Long]("m0").toDouble / n0 + 0.5) / 1000000.0
    val conf1 = col("s6") >= t1
    val conf0 = (lit(1.0) - col("s6")) >= t0
    val assigned = when(conf1 && conf0,
        when(col("s6") >= lit(1.0) - col("s6"), 1L).otherwise(0L))
      .when(conf1, 1L).when(conf0, 0L)
    scored
      .select(col("y").cast("long").as("given_label"), assigned.as("j"))
      .groupBy(col("given_label"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("j") === col("given_label"), 1L).otherwise(0L)).as("n_confident_same"),
        sum(when(col("j").isNotNull && col("j") =!= col("given_label"), 1L)
          .otherwise(0L)).as("n_label_issues"),
        sum(when(col("j").isNull, 1L).otherwise(0L)).as("n_unassigned"))
      .withColumn("class_threshold",
        when(col("given_label") === 1L, t1).otherwise(t0))
  }

  /** WM1 — green-list watermark detection for model-generated text
    * (Kirchenbauer et al., "A Watermark for Large Language Models",
    * ICML 2023; the context-free green list is Zhao et al. 2023's
    * provably-robust Unigram-Watermark variant, which makes per-token
    * greenness independent and therefore exactly replayable in SQL).
    * A token is GREEN when its salted md5 bucket lands in the first
    * `1/buckets` of the hash space (γ = 1/buckets); a watermarking
    * sampler only emits green tokens, so generated text reads
    * green-ratio ≈ 1 while natural text reads ≈ γ. The detector is the
    * standard one-proportion z-test per document:
    * z = (g − γn)/√(nγ(1−γ)), flagged when n ≥ `minTokens` and the
    * micro-rounded z clears `zThresh` (γ = 0.25, z > 4 ⇒ a natural-text
    * false positive needs a +4σ green excess).
    *
    * Exactness: n and g are integers from the same salted-md5 bucket
    * grid the DuckDB oracle recomputes; the only doubles are the final
    * ratio/z (IEEE-determined from integer inputs, micro-rounded on
    * both sides). Scale: one projection — greenness is an in-row
    * filtered-array count, no shuffle, no state. */
  def watermarkDetect(documents: DataFrame, salt: String = "wm1",
                      buckets: Int = 4, minTokens: Int = 8,
                      zThresh: Double = 4.0): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(minTokens >= 1, s"minTokens must be positive, got $minTokens")
    val gamma = 1.0 / buckets
    val green = (t: org.apache.spark.sql.Column) =>
      Sampling.hashBucket(concat(lit(s"$salt:"), t), buckets) === 0
    val n = col("n_tokens").cast("double")
    val g = col("n_green").cast("double")
    val z = (g - lit(gamma) * n) / sqrt(n * lit(gamma * (1.0 - gamma)))
    documents
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(filter(toks, green)).cast("long").as("n_green"))
      .select(col("doc_id"), col("n_tokens"), col("n_green"),
        portableRound(g / n, 6).as("green_ratio"),
        portableRound(z, 6).as("z_score"),
        (col("n_tokens") >= minTokens &&
          portableRound(z, 6) > zThresh).as("detected"))
  }

  /** BON1 — best-of-n selection (rejection sampling) over a scored
    * candidate pool: the RLHF-era data op that keeps, per prompt group,
    * the highest-reward candidate (Stiennon et al. 2020's best-of-n
    * policy; Touvron et al. 2023 use it to build SFT data from reward
    * scores). Here the reward is the distilled quality head's held-out
    * score (`s6` on the 1e-6 grid) and a prompt group is a salted hash
    * bucket of doc_id — the deterministic stand-in for "n samples from
    * one prompt". Per group: candidate count, the winner (highest s6,
    * ties to the smallest doc_id), the winner's score, the group mean
    * (micro-unit exact — the expected score of RANDOM selection), and
    * the uplift best-of-n buys over that baseline.
    *
    * Scale: one hash aggregation on the group key + the rank-1 window
    * on the same key — candidate pools shuffle once, state per group is
    * O(1). At 100 TB the group key is the real prompt id and nothing
    * changes shape. */
  def bestOfN(scored: DataFrame, nGroups: Int = 16,
              salt: String = "bon1"): DataFrame = {
    require(nGroups >= 1, s"nGroups must be positive, got $nGroups")
    def micro(c: org.apache.spark.sql.Column) =
      floor(c * 1000000.0 + 0.5).cast("long")
    val grp = scored.select(col("doc_id"), col("s6"),
      Sampling.hashBucket(
        concat(lit(s"$salt:"), col("doc_id").cast("string")), nGroups).as("g"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("s6").desc, col("doc_id").asc)
    val best = grp.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("g"), col("doc_id").as("best_doc_id"),
        col("s6").as("best_score"))
    val agg = grp.groupBy(col("g"))
      .agg(count(lit(1)).as("n_candidates"), sum(micro(col("s6"))).as("sm"))
    val mean = floor(col("sm").cast("double") / col("n_candidates") + 0.5) / 1000000.0
    agg.join(best, Seq("g"))
      .select(col("g"), col("n_candidates"), col("best_doc_id"),
        col("best_score"), mean.as("mean_score"),
        portableRound(col("best_score") - mean, 6).as("uplift"))
  }

  /** CONS1 — self-consistency / majority-vote sample filtering (Wang et
    * al., "Self-Consistency Improves Chain of Thought Reasoning", ICLR
    * 2023; the keep-the-agreeing-samples form is the rejection
    * fine-tuning move of Zelikman et al.'s STaR and Yuan et al. 2023):
    * samples sharing a prompt vote on their extracted answer, the
    * majority answer wins, and only samples agreeing with the majority
    * survive into the training set. Deterministic stand-ins on the
    * fixture: a prompt group is a salted hash bucket of doc_id, and a
    * sample's "extracted answer" is its modal token (highest count,
    * ties to the lexicographically smallest token) — the shape of
    * answer extraction without a parser. Per prompt: sample count,
    * distinct answers, the majority answer (ties to the smallest
    * answer), agreeing-sample count and the agreement ratio — the
    * filter keeps exactly `n_agree` samples per prompt.
    *
    * Scale: token mode is one (doc, token) hash aggregation + a rank-1
    * window per doc; the vote is the same pair on (prompt, answer) —
    * four key-compact shuffles, all corpus-linear, no driver state. */
  def selfConsistency(documents: DataFrame, nPrompts: Int = 64,
                      salt: String = "cons1"): DataFrame = {
    require(nPrompts >= 1, s"nPrompts must be positive, got $nPrompts")
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("cnt").desc, col("tok").asc)
    val answers = documents
      .select(col("doc_id"),
        Sampling.hashBucket(
          concat(lit(s"$salt:"), col("doc_id").cast("string")), nPrompts).as("p"),
        explode(toks).as("tok"))
      .groupBy(col("doc_id"), col("p"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("p"), col("tok").as("answer"))
    val wPrompt = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p")).orderBy(col("votes").desc, col("answer").asc)
    val majority = answers.groupBy(col("p"), col("answer"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("rn", row_number().over(wPrompt))
    val stats = majority.groupBy(col("p"))
      .agg(sum(col("votes")).as("n_samples"),
        count(lit(1)).as("n_distinct_answers"))
    majority.filter(col("rn") === 1)
      .select(col("p"), col("answer").as("majority_answer"),
        col("votes").as("n_agree"))
      .join(stats, Seq("p"))
      .select(col("p"), col("n_samples"), col("n_distinct_answers"),
        col("majority_answer"), col("n_agree"),
        portableRound(col("n_agree").cast("double") / col("n_samples"), 6)
          .as("agreement_ratio"))
  }
}
