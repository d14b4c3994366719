package graft.plans

import graft.{Queries, SparkTestBase}
import graft.util.ShuffleBill

/** Shuffle bills of the round-15-continuation ops, measured and pinned
  * (the ShipLineBillSpec discipline): COST.md's per-op scale claims as
  * failing tests. All are loop-free plans, so each bill is an absolute
  * plan constant; a stage gaining a shuffle (or a projection silently
  * acquiring one) moves the number and fails here. Broadcast exchanges
  * are deliberately NOT counted — they are the cheap side of the plan
  * and whether a side broadcasts is the stats-adaptive choice the d5
  * switch documents (at corpus scale some flip to shuffle joins; the
  * SHUFFLE bills below are what must not silently grow). */
class ContinuationBillSpec extends SparkTestBase {

  private def billOf(name: String): Int =
    ShuffleBill.measure(spark) {
      Queries.all(name)(spark, sf0001).collect()
    }

  test("conv1 is shuffle-free: one codegen'd projection") {
    assert(billOf("conv1_sft_assemble") == 0)
  }

  test("d14 pays the two-level distinct aggregate on the canonical form") {
    // (canonical, url) partial-distinct exchange + canonical rollup
    assert(billOf("d14_url_dedup") == 2)
  }

  test("ka1 pays the two-level distinct aggregate on the QI columns") {
    // (QI, sensitive) partial-distinct exchange + QI rollup
    assert(billOf("ka1_k_anonymity") == 2)
  }

  test("mem1 pays train-distinct + doc rollup + source rollup") {
    // the membership probe itself BROADCASTS the distinct train-key set
    // at this SF (stats-adaptive; at corpus scale it becomes the sg-keyed
    // shuffle join COST.md bills) — the pinned shuffles are the sg
    // distinct, the (doc_id, source) rollup and the source rollup
    assert(billOf("mem1_ngram_novelty") == 3)
  }

  test("rag1 pays the q_id top-k exchange only (queries broadcast)") {
    assert(billOf("rag1_context_assembly") == 1)
  }

  test("lab1 pays the kNN q_id window + the confusion rollup") {
    // neighbor-label and true-label joins broadcast (dimension-sized)
    assert(billOf("lab1_knn_label_spread") == 2)
  }

  test("div1 pays the two-level distinct aggregate on (source, n)") {
    assert(billOf("div1_distinct_ngrams") == 2)
  }

  test("sft2 pays the pack shard exchange + the bin rollup") {
    // the mask join-back BROADCASTS the checkpointed conv frame at this
    // SF (stats-adaptive) — the pinned shuffles are the pack's shard
    // repartition and the (shard, seq_id) rollup
    assert(billOf("sft2_mask_pack") == 2)
  }

  test("release3 pays sft2's bill + the per-shard card rollup") {
    assert(billOf("release3_sft_release") == 3)
  }

  test("mm5 is shuffle-free: synth projection + mapPartitions byte walk") {
    assert(billOf("mm5_audio_frames") == 0)
  }

  test("wm1 is shuffle-free: greenness is an in-row filtered-array count") {
    assert(billOf("wm1_watermark_detect") == 0)
  }

  test("bon1 pays the distill bill + the group window/rollup") {
    // delta over the shared train-and-score prefix (cl1's discipline):
    // what bon1 itself adds on top of scoring must stay the g-keyed
    // window + rollup, not silently grow
    val distill = ShuffleBill.measure(spark) {
      val (scored, _) = graft.operators.TextAnalysis.distillHeldOutScores(
        graft.Tables.documents(spark, sf0001).withColumn("y",
          (org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("text")) > 100).cast("double")))
      scored.collect()
    }
    assert(billOf("bon1_best_of_n") - distill == 2)
  }

  test("sd1 pays the digest window + the source rollup") {
    // copy counts ride ONE digest-keyed window (no join-back)
    assert(billOf("sd1_soft_dedup") == 2)
  }

  test("hub1 pays rank window + in-degree + histogram/moments") {
    assert(billOf("hub1_hubness") == 5)
  }

  test("ctx1 pays the token-mass aggregate + the bucket rollup") {
    // corpus pass 1: the 1-row long/short token-mass agg (broadcast
    // back); corpus pass 2: the bucket rollup over the flagged frame;
    // the achieved-share join-back runs on the checkpointed 2-row frame
    assert(billOf("ctx1_length_mix") == 3)
  }

  test("faith1 adds ZERO shuffles to rag1's bill: grounding is in-row") {
    // the answer synthesis, gram sets and support counts are all
    // filtered-array arithmetic on the per-query frame — rag1's one
    // q_id top-k exchange is the whole bill
    assert(billOf("faith1_rag_grounding") == 1)
  }

  test("bitext1 pays exactly the two rank-window exchanges") {
    // the cross score broadcasts (one side is always the smaller
    // "language"); each direction's rank AND neighborhood sum share one
    // partitioning, and the mutual filter + margin are in-row — the
    // join-back form of the same op measured 6
    assert(billOf("bitext1_margin_mining") == 2)
  }

  test("cons1 pays the two vote rounds: mode per doc, majority per prompt") {
    // (doc,p,tok) count + doc-keyed rank window, then (p,answer) votes +
    // p-keyed rank window + the stats/top join-back on p
    assert(billOf("cons1_self_consistency") == 5)
  }

  test("fk1 is one rollup: readability is a codegen'd projection") {
    // grade/ease/syllables are regexp counts in-row; the only exchange
    // is the (source, bucket) histogram aggregate
    assert(billOf("fk1_readability") == 1)
  }

  test("bq1 pays the three rank windows + the recall accounting") {
    // corpus-scale: the Hamming rank window and the exact-arm brute
    // window (both q_id-keyed over the queries×corpus frame — the exact
    // arm exists only because this is a recall AUDIT); candidate-scale:
    // the rerank window plus the intersection joins and 1-row recall
    // aggregates, all on ≤ queries×candK-row frames
    assert(billOf("bq1_binary_hamming") == 9)
  }

  test("cs1 is one rollup: window langs and switches are in-row arrays") {
    assert(billOf("cs1_code_switch") == 1)
  }

  test("clq1 adds the bounded audit exchanges to the d7 pair-stream + CC bill") {
    // d7 (same pair stream + star-contraction CC) measures 13 at this
    // SF; the audit adds the sizes aggregate, the within-cluster label
    // join/rollup and the final cluster join — all keyed on cluster ids,
    // never the corpus text. BOTH label-side joins are stats-adaptive on
    // the checkpointed cluster frame's in-memory size (each: broadcast
    // in a fresh session, shuffle after a long session — the r15 full-
    // suite run observed both flipped at once → 20; at corpus scale
    // the shuffle form is the real plan) — all are the same id-keyed
    // plan, so the honest band is 18..20 and anything past it is a new
    // exchange, not a stats flip
    val b = billOf("clq1_cluster_purity")
    assert(b >= 18 && b <= 20, s"audit bill drifted: $b")
  }

  test("typo1 runs on the vocab frame: count agg + candidate join + rank") {
    // the deletion-neighborhood join and the per-token rank window run
    // on vocab-sized frames; the only corpus-sized exchange is the term
    // count itself
    assert(billOf("typo1_spell_noise") == 3)
  }

  test("canary1: the corpus appears only in the term count") {
    // candidate scoring, ranks and control stats all run on the 64-row
    // literal candidate frame
    // term count + totals + the candidate-frame score/rank/control
    // exchanges (64-row frames)
    assert(billOf("canary1_exposure") == 5)
  }

  test("mink1 pays term counts + totals + doc rollup + class rollup") {
    // the probe-token/vocab join broadcasts (vocab-sized; flips to a
    // tok-keyed shuffle join at real vocab scale)
    assert(billOf("mink1_membership") == 4)
  }

  test("ssp1 adds exactly rank + sizes + rollup to lloyd's bill") {
    // kmeans1's training/assignment chain measures 11 at this SF; the
    // pruning adds the cid-keyed rank window, the k-row sizes aggregate
    // (broadcast back) and the per-cluster accounting rollup
    assert(billOf("ssp1_prototype_prune") == 14)
  }
}
