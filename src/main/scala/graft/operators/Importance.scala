package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** DSIR-style importance weighting — "Data Selection for Language Models
  * via Importance Resampling" (Xie et al., NeurIPS 2023, public): score
  * every document in a raw pool by how much more likely its hashed-unigram
  * bag is under the TARGET distribution (the in-domain slice you want more
  * of) than under the raw pool's own distribution. The classic use: select
  * web-crawl documents that "look like" a curated corpus without training a
  * classifier — two smoothed bag-of-features language models and a
  * log-likelihood ratio.
  *
  * The reference engine has nothing like this (its scope ends at
  * join/filter/aggregate — /root/reference/src/lib/spacex.js:24-40); it is
  * part of the training-data-pipeline extension alongside d1–d10/t1–t12.
  *
  * Plan shape, and why it holds at 100 TB:
  *   - one narrow token explode (no shuffle);
  *   - ONE hash aggregation over the feature space to build BOTH models
  *     (`featureBuckets` rows — the target counts ride along as a
  *     conditional sum, so the target slice is never re-scanned);
  *   - the per-feature log-ratio table is `featureBuckets` rows → broadcast
  *     back onto the token stream (map-side, no shuffle);
  *   - one doc_id-keyed rollup — the only corpus-sized shuffle, carrying
  *     `(doc_id, bucket)` pairs.
  *
  * Determinism discipline (the oracle hashes this): per-feature log-ratios
  * are snapped to integer MICRO-units (`floor(x·1e6 + 0.5)` — the
  * [[graft.functions.portableRound]] grid) and the per-document score is a
  * sum of BIGINTs, which is exact and order-free — no float-summation-order
  * dependence between engines, partitionings or scales. The two `ln` calls
  * sit BEFORE the snap, on arguments that are ratios of integer-valued
  * doubles, so both engines feed libm identical bits.
  */
object Importance {

  /** Per-document DSIR log importance weight over hashed unigrams.
    *
    * @param docs     corpus; one row per document
    * @param idCol    document key (any orderable type)
    * @param textCol  whitespace-tokenized text
    * @param isTarget boolean column marking the in-domain slice the weight
    *                 should favor (e.g. `lang === "en"`, or a quality
    *                 verdict from [[TextAnalysis]])
    * @param featureBuckets hashed-feature vocabulary size; the model table
    *                 is this many rows regardless of corpus size
    * @return doc_id, n_tokens, dsir_logw (Σ per-token log target/raw
    *         likelihood ratio, micro-unit exact), keep (= dsir_logw > 0:
    *         the document looks more target-like than pool-average)
    */
  def dsirWeights(docs: DataFrame, idCol: Column, textCol: Column,
                  isTarget: Column, featureBuckets: Int = 128): DataFrame = {
    require(featureBuckets > 0, s"featureBuckets must be positive, got $featureBuckets")
    val feat = docs
      .select(idCol.as("doc_id"), isTarget.as("_tgt"),
        explode(split(textCol, " ")).as("_t"))
      .select(col("doc_id"), col("_tgt"),
        Sampling.hashBucket(col("_t"), featureBuckets).as("_f"))
    // one pass builds both language models: raw-pool counts and the
    // target slice's counts per hashed feature
    val counts = feat.groupBy("_f").agg(
      count(lit(1)).cast("double").as("_cAll"),
      sum(when(col("_tgt"), 1L).otherwise(0L)).cast("double").as("_cTgt"))
    // feature-space totals: sums of integer-valued doubles — exact in any
    // order, so the broadcast scalar is bit-identical across engines
    val totals = counts.agg(sum(col("_cAll")).as("_nAll"), sum(col("_cTgt")).as("_nTgt"))
    val fb = lit(featureBuckets.toDouble)
    val lr = counts.crossJoin(broadcast(totals))
      .select(col("_f"),
        floor((log((col("_cTgt") + 1.0) / (col("_nTgt") + fb))
             - log((col("_cAll") + 1.0) / (col("_nAll") + fb))) * 1000000.0 + 0.5)
          .cast("long").as("_micro"))
    feat.join(broadcast(lr), "_f")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("_micro")).as("_m"))
      .select(col("doc_id"), col("n_tokens"),
        (col("_m").cast("double") / 1000000.0).as("dsir_logw"),
        (col("_m") > 0L).as("keep"))
  }
}
