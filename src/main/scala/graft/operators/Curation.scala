package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between raw ingest and training: benchmark decontamination,
  * incremental (new-batch-vs-corpus) dedup, and heavy-hitter token
  * statistics. All batch-declarative except the Misra–Gries summary,
  * which is genuine per-partition imperative state (the sanctioned
  * `mapPartitions` case) merged by one hash aggregation. */
object Curation {

  /** Benchmark decontamination: flag corpus documents that share any
    * token n-gram with an evaluation/benchmark document. Output one row
    * per contaminated doc: the number of its distinct shingles that occur
    * anywhere in the benchmark set, the number of distinct benchmark docs
    * hit, and the contaminated fraction of its shingles (portably
    * rounded).
    *
    * Scale shape: inverted-index join on the shingle — the benchmark
    * side of a real decontamination run is a few MB (eval sets) against
    * a 100 TB corpus, so Spark broadcasts it and the corpus side never
    * shuffles. Shingling runs the one-pass codegen'd
    * [[graft.functions.ShingleHashes]] kernel inside the scan stage (no
    * per-doc window exchange — [[Dedup.shingleStream]] trades one
    * token-stream shuffle for codegen'd CPU, the right trade for d4's
    * pair join but wrong here, where the whole point is a shuffle-free
    * corpus pass), and the join key is the 8-byte shingle hash. The
    * string-level DuckDB oracle replays the counts from the shingles
    * themselves, so a hash collision that perturbed any count would fail
    * the round's parity gate (p ≈ 10⁻⁹ at fixture cardinality); the
    * per-doc rollup is one hash aggregation. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int = 5): DataFrame = {
    val sh = array_distinct(graft.functions.shingle_hashes(col("text"), n))
    val corpusSh = corpus.select(col("doc_id"), explode(sh).as("sg"))
    val benchSh = benchmark.select(col("doc_id").as("bench_id"), explode(sh).as("sg"))
    val perDoc = corpus
      .filter(size(split(col("text"), " ")) >= n)
      .select(col("doc_id"), size(sh).cast("long").as("n_shingles"))
    corpusSh.join(benchSh, "sg")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("sg")).as("n_hit_shingles"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
      .join(perDoc, "doc_id")
      .select(col("doc_id"), col("n_hit_shingles"), col("n_bench_docs"),
        graft.functions.portableRound(
          col("n_hit_shingles").cast("double") / col("n_shingles"), 4)
          .as("hit_ratio"))
  }

  /** [[decontaminate]] with a Bloom-filter pre-pass — the shape for when the
    * benchmark/eval set is too big to broadcast EXACTLY but its membership
    * fits a fixed-size filter. The filter is built distributed over the
    * benchmark shingle hashes (`BloomFilterAggregate` — Spark's own
    * runtime-row-filter machinery), collected as ONE blob (`numBits/8`
    * bytes — codebook-sized metadata, like a centroid table), and probed
    * in-scan on the corpus side, so the shuffle into the confirm join
    * carries only the ~hit-rate fraction of corpus shingles instead of all
    * of them. Bloom filters have NO false negatives and the confirm join
    * removes the ~2% false positives, so the result is bit-identical to
    * [[decontaminate]] — same oracle, not a weaker gate. */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame, n: Int = 5,
                         estShingles: Long = 1000000L): DataFrame = {
    val sh = array_distinct(graft.functions.shingle_hashes(col("text"), n))
    val benchSh = benchmark.select(col("doc_id").as("bench_id"), explode(sh).as("sg"))
    val corpusSh = corpus.select(col("doc_id"), explode(sh).as("sg"))
    val perDoc = corpus
      .filter(size(split(col("text"), " ")) >= n)
      .select(col("doc_id"), size(sh).cast("long").as("n_shingles"))
    val bloomBytes = benchSh
      .agg(graft.functions.bloom_filter_agg(col("sg"), estShingles,
        estShingles * 8L).as("bf"))
      .head.getAs[Array[Byte]](0)
    val candidates =
      if (bloomBytes == null) corpusSh.limit(0) // empty benchmark: no filter, no hits
      else corpusSh.filter(graft.functions.might_contain(lit(bloomBytes), col("sg")))
    candidates.join(benchSh, "sg")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("sg")).as("n_hit_shingles"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
      .join(perDoc, "doc_id")
      .select(col("doc_id"), col("n_hit_shingles"), col("n_bench_docs"),
        graft.functions.portableRound(
          col("n_hit_shingles").cast("double") / col("n_shingles"), 4)
          .as("hit_ratio"))
  }

  /** Incremental dedup: admit only incoming documents whose content
    * digest is (a) unseen in the existing corpus and (b) first within the
    * incoming batch (lowest doc_id per digest). This is the nightly-ingest
    * shape: the corpus side is only ever probed by digest, so at 100 TB it
    * is one shuffle of 16-byte digests (or a bloom-filter pre-pass that
    * skips the shuffle for the ~99% of novel documents); the in-batch
    * winner is one top-1-per-key aggregation, not a sort.
    *
    * Output: admitted rows as (doc_id, digest), plus nothing for
    * duplicates — the caller joins back to the payload by doc_id. */
  def dedupIncremental(incoming: DataFrame, corpus: DataFrame): DataFrame = {
    val inDig = incoming.select(col("doc_id"), md5(col("text")).as("digest"))
    val corpusDig = corpus.select(md5(col("text")).as("digest")).distinct()
    inDig
      .join(corpusDig, Seq("digest"), "left_anti")
      .groupBy(col("digest")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("digest"))
  }

  /** Exact heavy hitters: the k most frequent whitespace tokens across
    * the corpus. One partial-aggregated count (map-side combine absorbs
    * per-partition repetition) and a global top-k, which Spark executes
    * as TakeOrderedAndProject — every partition ships only its own top-k
    * candidates, never a global sort. Ties break token-ascending. */
  def heavyHittersExact(documents: DataFrame, k: Int): DataFrame =
    documents.select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)

  /** Slowly-changing-dimension (type 2) history: collapse an ordered
    * change stream into effective-dated regime rows per key. Consecutive
    * repeats of `attr` drop; each surviving row's interval runs to the
    * next change (`valid_to` null on the current row — the caller picks
    * its own open-interval sentinel). `orderBy` must be a deterministic
    * total order within the key (pass a tiebreaker column). Both windows
    * partition by the dimension key — no global sort at any scale. */
  def scd2(changes: DataFrame, key: org.apache.spark.sql.Column,
           attr: org.apache.spark.sql.Column, ts: org.apache.spark.sql.Column,
           tiebreak: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key).orderBy(ts, tiebreak)
    changes
      .withColumn("_prev_attr", lag(attr, 1).over(w))
      .filter(col("_prev_attr").isNull || col("_prev_attr") =!= attr)
      .withColumn("_next_ts", lead(ts, 1).over(w))
      .select(key.as("key"), attr.as("attr"), ts.as("valid_from"),
        col("_next_ts").as("valid_to"), col("_next_ts").isNull.as("is_current"))
  }

  /** Apply a CDC change feed WITH delete support: for each key, the
    * winning change by `orderCols` wins, and a winning delete op removes
    * the key from the result entirely — the full I/U/D MERGE semantics
    * on top of u5/st6's latest-wins upsert.
    *
    * `orderCols` follows [[graft.plans.TopKPerKey]]'s convention:
    * `(column, ascending)` pairs, so mixed-direction version orderings
    * (e.g. version desc, ingest-epoch asc as tiebreak) are expressible.
    * "Latest wins" is `(col, false)` — descending.
    *
    * The election runs on the native top-k-per-key operator (bounded
    * heap, one shuffle on the key, no sort), and the delete filter is a
    * post-projection — applying a feed of C changes against any table
    * size costs C plus the touched keys, never the table. */
  def applyChangeFeed(changes: DataFrame, keyCols: Seq[String],
                      orderCols: Seq[(String, Boolean)], opCol: String,
                      deleteOp: String = "D"): DataFrame =
    graft.plans.TopKPerKey(changes, keyCols, orderCols, 1)
      .filter(col(opCol) =!= deleteOp)

  /** Distributed Misra–Gries heavy-hitter summary: each partition keeps at
    * most `budget` counters over its token stream (decrement-all on
    * overflow), then one hash aggregation sums the surviving counters.
    * Guarantees, merged (with N = total token count, P = partitions):
    * every estimate is a LOWER bound on the true count, the underestimate
    * is at most N/(budget+1) (the per-partition bounds Σ n_p/(budget+1)
    * telescope), and any token with true count above that bound is
    * present. So the exact top-k is contained in the summary whenever the
    * k-th count clears N/(budget+1) — the driver gate checks exactly
    * that, plus the bound itself, against the exact counts.
    *
    * This is the 100 TB shape for "top tokens over everything": the
    * per-partition state is O(budget), the merge is one shuffle of at
    * most P×budget rows, and nothing ever materializes the full token
    * vocabulary. */
  def heavyHittersSketch(documents: DataFrame, budget: Int): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val tokens: Dataset[String] =
      documents.select(explode(split(col("text"), " ")).as("token")).as[String]
    tokens.mapPartitions { it =>
      val counters = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      it.foreach { t =>
        if (counters.contains(t)) counters(t) += 1L
        else if (counters.size < budget) counters(t) = 1L
        else {
          // decrement-all; drop zeroed counters (classic Misra–Gries step).
          // Snapshot the keys: removing while iterating a mutable map is
          // undefined, and overflows are rare (≤ N/(budget+1) of them).
          counters.keys.toArray.foreach { k =>
            val c = counters(k) - 1L
            if (c == 0L) counters.remove(k) else counters(k) = c
          }
        }
      }
      counters.iterator.map { case (t, c) => (t, c) }
    }.toDF("token", "est")
      .groupBy(col("token")).agg(sum(col("est")).as("est"))
  }

  /** Canonical-document selection ("dedup keep-best"): after near-dup
    * pair detection, keep each duplicate cluster's HIGHEST-QUALITY member
    * instead of an arbitrary id — the curation policy real training
    * pipelines run (drop the boilerplate copy, keep the clean one).
    *
    * Composition, all shared machinery so the semantics cannot drift:
    * clusters from [[Dedup.duplicateClusters]] (large/small-star
    * contraction, O(log diameter) rounds) and quality from
    * [[TextAnalysis.qualityExpr]] (the same expression t2/t10 score
    * with). The k=1 election + member count fold into ONE hash
    * aggregation via a struct-max argmax — partial (map-side) argmax per
    * partition, one shuffle of O(1)-state rows per cluster, no sort and
    * no second join ([[graft.plans.TopKPerKey]] stays the shape for
    * k>1). Ties break doc_id-ascending (negated id inside the max
    * struct), making the winner a pure function of the corpus.
    *
    * Output: one row per cluster — (cluster_rep, kept_id, kept_quality,
    * n_members). Scale: the pair graph is near-dup-sparse by
    * construction (LSH/banded upstream), member scoring is one
    * projection, and the election state is O(1) per cluster. */
  def keepBest(documents: DataFrame, pairs: DataFrame): DataFrame =
    Dedup.duplicateClusters(pairs)
      .join(documents.select(col("doc_id"),
        TextAnalysis.qualityExpr.as("quality")), "doc_id")
      .groupBy(col("cluster_rep"))
      .agg(max(struct(col("quality"), (-col("doc_id")).as("neg_id"))).as("best"),
        count(lit(1)).as("n_members"))
      .select(col("cluster_rep"), (-col("best.neg_id")).as("kept_id"),
        col("best.quality").as("kept_quality"), col("n_members"))

  /** Corpus snapshot diff: classify every document across two snapshot
    * generations as added / removed / changed / unchanged — the audit
    * step between nightly crawls that tells you what actually moved
    * before you pay for a re-dedup or re-training run.
    *
    * Scale shape: both sides reduce to (doc_id, 16-byte content digest)
    * IN THE SCAN, so the full-outer join — the only exchange — shuffles
    * fixed-width rows no matter how large the documents are; payload
    * bytes never move. At 100 TB this is the difference between diffing
    * manifests and diffing the corpus. */
  def snapshotDiff(prev: DataFrame, cur: DataFrame): DataFrame = {
    val a = prev.select(col("doc_id"), md5(col("text")).as("_dg_prev"))
    val b = cur.select(col("doc_id"), md5(col("text")).as("_dg_cur"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("_dg_prev").isNull, "added")
          .when(col("_dg_cur").isNull, "removed")
          .when(col("_dg_prev") === col("_dg_cur"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Quantile (rank) normalization of a numeric signal within strata:
    * each row's value becomes its empirical CDF position
    * `(rank − 1)/(n − 1)` inside its stratum — the scale-free form every
    * curriculum/mixing policy wants ("the 90th-percentile-longest doc OF
    * ITS SOURCE"), immune to the cross-source scale drift that breaks
    * absolute thresholds. Ties share a rank (same value ⇒ same quantile,
    * in both engines by SQL `rank()` semantics); a one-row stratum maps
    * to 0. Computed with explicit rank/count windows rather than the
    * engine's `percent_rank` so the n = 1 edge case is pinned by OUR
    * formula, not each engine's.
    *
    * Scale shape: two frames over one stratum-keyed sort — rank and
    * stratum size share the same exchange, values never leave their
    * stratum, and the output is a projection (no data-width shuffle). A
    * stratum is a (lang, source) shard, orders of magnitude smaller than
    * the corpus; skew lives with the biggest source, which is exactly
    * what [[Layout.joinKeySkewAudit]] measures. */
  def quantileNormalize(df: DataFrame, strataCols: Seq[String],
                        valueCol: String, outCol: String = "qn"): DataFrame = {
    import graft.functions.portableRound
    import org.apache.spark.sql.expressions.Window
    val strata = strataCols.map(col)
    val wRank = Window.partitionBy(strata: _*).orderBy(col(valueCol))
    val wAll = Window.partitionBy(strata: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val n = count(lit(1)).over(wAll)
    df.withColumn(outCol,
      when(n > 1,
        portableRound((rank().over(wRank) - 1).cast("double") /
          (n - 1).cast("double"), 6))
        .otherwise(0.0))
  }

  /** Population-stability-index drift of each source's document-length
    * distribution against a reference source — the monitoring metric that
    * catches "this crawl snapshot's length profile shifted" before it
    * poisons a mixture: PSI = Σ_bins (q_i − p_i)·ln(q_i/p_i) over the
    * REFERENCE'S decile bins (fences frozen from the reference, applied
    * to everyone — drift is measured against the reference's geometry,
    * not each source's own). +1 Laplace smoothing keeps empty bins
    * finite and deterministic. Rule of thumb: <0.1 stable, >0.25 shifted.
    *
    * Shape: fences are one exact-percentile aggregate on the reference
    * slice broadcast to a single data-sized binning pass (the q7/hist2
    * anchor — swap the sketch in at 100 TB); the PSI arithmetic runs on
    * the sources×bins grid. ln terms are rounded then decimal-summed. */
  /** DoReMi-style domain reweighting (Xie et al. 2023, arXiv:2305.10429):
    * multiplicative-weights over source domains driven by EXCESS loss —
    * each round, a domain whose proxy loss exceeds the current
    * weight-averaged baseline gains weight (exp(η·excess)), then weights
    * renormalize and mix with uniform smoothing c/K. The proxy loss here
    * is the domain's token-weighted unigram surprisal (lm1's fluency
    * model) — deterministic, data-derived, and recomputed against a
    * baseline that MOVES with the weights, which is what makes the
    * iteration genuinely sequential.
    *
    * Determinism: the domain loss L_d lands as a micro-unit BIGINT; the
    * per-round baseline Σ w·L and normalizer Σ g fold as exact integers
    * (order-free), and every per-domain update is one fixed textual
    * double formula snapped back to micro-units — the oracle unrolls the
    * ten rounds as materialized CTE stages and replays digit for digit.
    *
    * Shape: ONE data-sized pass (the token-surprisal aggregation);
    * iterations run on K-row domain state (K = distinct sources —
    * codebook-sized forever). */
  def doremiWeights(documents: DataFrame, iters: Int = 10, eta: Double = 0.5,
                    smooth: Double = 0.01): DataFrame = {
    import graft.functions.portableRound
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(eta > 0, s"eta must be positive, got $eta")
    require(smooth >= 0 && smooth < 1, s"smooth in [0,1), got $smooth")
    val toks = split(col("text"), " ")
    val tokStream = documents.select(col("doc_id"), explode(toks).as("tok"))
    val counts = tokStream.groupBy(col("tok")).agg(count(lit(1)).as("n_w"))
    val totals = counts.agg(sum(col("n_w")).as("n_total"),
      count(lit(1)).as("v_size"))
    val surp = portableRound(-log((col("n_w") + 1).cast("double") /
      (col("n_total") + col("v_size")).cast("double")), 6)
    val perSource = tokStream.join(counts, "tok")
      .crossJoin(broadcast(totals))
      .withColumn("surp", surp)
      .join(documents.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_tokens"),
        floor(sum(col("surp").cast("decimal(18,6)")).cast("double") /
          count(lit(1)) * 1000000.0 + 0.5).cast("long").as("l_micro"))
    val rows = perSource.orderBy(col("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val k = rows.length
    require(k >= 2, s"doremiWeights needs >= 2 domains, got $k")
    val ls = rows.map(_._3)
    var w: Array[Long] = Array.fill(k)(math.floor(1000000.0 / k).toLong)
    for (_ <- 1 to iters) {
      val bMicro2 = (0 until k).map(i => BigInt(w(i)) * BigInt(ls(i))).sum
      val base = bMicro2.toDouble / 1000000000000.0
      val g = (0 until k).map { i =>
        math.floor(w(i).toDouble / 1000000 *
          math.exp(eta * (ls(i).toDouble / 1000000 - base)) * 1000000 + 0.5)
          .toLong
      }
      val z = g.map(BigInt(_)).sum
      w = (0 until k).map { i =>
        math.floor(((1.0 - smooth) * (g(i).toDouble / z.toDouble) +
          smooth / k) * 1000000 + 0.5).toLong
      }.toArray
    }
    val spark = documents.sparkSession
    import spark.implicits._
    rows.zipWithIndex.map { case ((src, nTok, l), i) =>
      (src, nTok, l.toDouble / 1000000, w(i).toDouble / 1000000)
    }.toSeq.toDF("source", "n_tokens", "loss", "weight")
  }

  /** Data-constrained epoch allocation (the Muennighoff et al. 2022
    * "Scaling Data-Constrained Language Models" shape): given each
    * source's unique-token count and a total training-token budget,
    * decide how many EPOCHS (repeats) each source gets when repeated
    * data is worth less each pass. Epoch e of source s has marginal
    * value u_s·δ^(e-1) (δ = 1/2 here); the greedy takes candidate epochs
    * in global marginal-value order — ties to (source, e) — and admits
    * the prefix that fits the budget (admission halts at the first
    * epoch that no longer fits). Because marginals strictly decrease in
    * e for u_s > 0, admitted epochs are contiguous per source, so the
    * output is a well-defined epoch COUNT per source.
    *
    * Budget = total·num/den (default 2.2× the unique mass, forcing real
    * multi-epoch trade-offs). Marginals are u/2^(e-1) — exact in binary
    * for integer u, so the cross-engine ordering and the admitted-value
    * sums are bit-stable with no decimal grid needed.
    *
    * Scale shape: ONE map-side-combined rollup over the corpus
    * (source → token sum); everything after operates on a
    * |sources|×maxEpochs METADATA frame (tens of rows at any corpus
    * size), where the global ordering window is free. */
  def epochAllocation(documents: DataFrame, maxEpochs: Int = 6,
                      budgetNum: Int = 11, budgetDen: Int = 5): DataFrame = {
    import graft.functions.portableRound
    import org.apache.spark.sql.expressions.Window
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    require(budgetNum >= 1 && budgetDen >= 1,
      s"budget ratio must be positive: $budgetNum/$budgetDen")
    val u = documents.groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("unique_tokens"))
    val b = u.agg(expr(s"(sum(unique_tokens) * $budgetNum) div $budgetDen")
      .cast("long").as("budget"))
    val cand = u.crossJoin(broadcast(b))
      .select(col("source"), col("unique_tokens"), col("budget"),
        explode(sequence(lit(1), lit(maxEpochs))).as("e"))
      .withColumn("marginal",
        col("unique_tokens").cast("double") / pow(lit(2.0), col("e") - 1))
    // global window over the metadata-sized candidate frame (|sources| ×
    // maxEpochs rows — NOT data-sized; the corpus never reaches it)
    val w = Window.orderBy(col("marginal").desc, col("source").asc,
        col("e").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cand.withColumn("spent", sum(col("unique_tokens")).over(w))
      .groupBy(col("source"), col("unique_tokens"), col("budget"))
      .agg(
        sum(when(col("spent") <= col("budget"), 1L).otherwise(0L))
          .as("epochs"),
        portableRound(sum(when(col("spent") <= col("budget"), col("marginal"))
          .otherwise(lit(0.0))), 4).as("value"))
      .withColumn("alloc_tokens",
        (col("epochs") * col("unique_tokens")).cast("long"))
      .select(col("source"), col("unique_tokens"), col("epochs"),
        col("alloc_tokens"), col("value"), col("budget"))
  }

  /** Materialize [[epochAllocation]]'s decision as the actual multi-epoch
    * training stream: each source's documents are replicated `epochs`
    * times, and every (doc, epoch) replica gets its own salted shard +
    * dense within-shard position ([[Sampling.epochShuffle]]'s discipline
    * with the epoch folded into the salt, so different epochs interleave
    * independently instead of replaying the same order). budget1 DECIDES
    * the repeats; budget2 lays out the stream that trains on them —
    * pack1/pack3 compose downstream unchanged.
    *
    * Shape: the allocation is a |sources|-row BROADCAST metadata join;
    * replication is an in-row explode bounded by maxEpochs; ordering is
    * ONE exchange on shard + a per-shard sort — never a global window,
    * so shards materialize independently at any corpus size. */
  def epochMaterialize(documents: DataFrame, maxEpochs: Int = 6,
                       budgetNum: Int = 11, budgetDen: Int = 5,
                       shards: Int = 8): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val alloc = epochAllocation(documents, maxEpochs, budgetNum, budgetDen)
      .select(col("source"), col("epochs"))
    val rep = documents.select(col("doc_id"), col("source"))
      .join(broadcast(alloc.filter(col("epochs") >= 1)), "source")
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1L), col("epochs"))).as("epoch"))
    val k = concat(col("epoch").cast("string"), lit(":"),
      col("doc_id").cast("string"))
    val shard = Sampling.hashBucket(concat(lit("bud-sh:"), k), shards)
    val ord = Sampling.hashBucket(concat(lit("bud-ord:"), k), 100000000)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(ord.asc, col("epoch").asc, col("doc_id").asc)
    rep.withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Preference-pair construction for reward-model / DPO training data:
    * inside each (lang, source) group, rank documents by quality
    * ([[TextAnalysis.qualityExpr]] — the same score t2/t10 gate on) and
    * pair the i-th best with the i-th worst (chosen rank i from the top,
    * rejected rank i from the bottom), keeping pairs whose quality
    * margin clears `minMargin` — the anti-symmetric matching that makes
    * every pair maximally separated for its rank while each document is
    * used at most once. bt1 RANKS from given pairwise outcomes; pref1
    * BUILDS the pairs a preference model trains on.
    *
    * Determinism: quality is 1e-4-grid-rounded; ranks tie-break on
    * doc_id; an odd group's median row pairs with nothing. Margins are
    * differences of identically-rounded doubles (exact IEEE subtraction
    * of identical inputs), re-rounded to the 1e-4 grid — bit-stable
    * cross-engine.
    *
    * Scale shape: ONE corpus scan and ONE exchange keyed (lang, source)
    * — no global window, and no self-join: each row projects its role
    * (chosen if rank*2 ≤ n, else rejected) and its pair index in-row,
    * and the pair assembles in a single hash aggregation keyed
    * (lang, source, pair_rank). Because the window's hash partitioning
    * is a SUBSET of the rollup's group keys, the aggregation reuses the
    * window's exchange — a naive chosen⋈rejected self-join plans two
    * full scan+window pipelines (measured: 9 exchanges vs 1 here). */
  def preferencePairs(documents: DataFrame,
                      minMargin: Double = 0.05): DataFrame = {
    import graft.functions.portableRound
    import org.apache.spark.sql.expressions.Window
    require(minMargin >= 0, s"minMargin must be >= 0, got $minMargin")
    val scored = documents.select(col("doc_id"), col("lang"), col("source"),
      TextAnalysis.qualityExpr.as("quality"))
    val grp = Window.partitionBy(col("lang"), col("source"))
    val ranked = scored
      .withColumn("rn", row_number().over(
        grp.orderBy(col("quality").desc, col("doc_id").asc)))
      .withColumn("n", count(lit(1)).over(grp))
    val isChosen = col("rn") * 2 <= col("n")
    ranked.select(col("lang"), col("source"),
        when(isChosen, col("rn").cast("long"))
          .otherwise((col("n") - col("rn") + 1).cast("long")).as("pair_rank"),
        when(isChosen, col("doc_id")).as("c_id"),
        when(isChosen, col("quality")).as("c_q"),
        when(!isChosen, col("doc_id")).as("r_id"),
        when(!isChosen, col("quality")).as("r_q"))
      .groupBy(col("lang"), col("source"), col("pair_rank"))
      .agg(max(col("c_id")).as("chosen_id"), max(col("c_q")).as("chosen_q"),
        max(col("r_id")).as("rejected_id"), max(col("r_q")).as("rejected_q"))
      // an odd group's median row is a rejected with no chosen twin
      .filter(col("chosen_id").isNotNull && col("rejected_id").isNotNull)
      .withColumn("margin",
        portableRound(col("chosen_q") - col("rejected_q"), 4))
      .filter(col("margin") >= minMargin)
      .select(col("lang"), col("source"), col("pair_rank"), col("chosen_id"),
        col("rejected_id"), col("chosen_q"), col("rejected_q"), col("margin"))
  }

  def psiDrift(documents: DataFrame, refSource: String = "src0",
               bins: Int = 10): DataFrame = {
    import graft.functions.portableRound
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val fenceCols = (1 until bins).map(i =>
      portableRound(percentile(col("n_chars"), lit(i.toDouble / bins)), 4)
        .as(s"f$i"))
    val fences = documents.filter(col("source") === refSource)
      .agg(fenceCols.head, fenceCols.tail: _*)
    val bin = (1 until bins).map(i =>
      (col("n_chars") > col(s"f$i")).cast("int")).reduce(_ + _).cast("long")
    val binned = documents.crossJoin(broadcast(fences))
      .select(col("source"), bin.as("bin"))
    val counts = binned.groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    // dense sources×bins grid: a bin missing from a source still carries
    // its Laplace mass — dropping it would understate the drift
    val grid = counts.select(col("source")).distinct()
      .crossJoin(documents.sparkSession.range(0, bins).select(col("id").as("bin")))
      .join(counts, Seq("source", "bin"), "left")
      .select(col("source"), col("bin"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val perSource = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val withN = grid.withColumn("n_src", sum(col("cnt")).over(perSource))
    val ref = withN.filter(col("source") === refSource)
      .select(col("bin"), col("cnt").as("ref_cnt"), col("n_src").as("n_ref"))
    val q = (col("cnt") + 1).cast("double") / (col("n_src") + bins).cast("double")
    val p = (col("ref_cnt") + 1).cast("double") / (col("n_ref") + bins).cast("double")
    val term = portableRound((q - p) * log(q / p), 8).cast("decimal(18,8)")
    withN.join(broadcast(ref), Seq("bin"))
      .withColumn("term", term)
      .groupBy(col("source"))
      .agg(max(col("n_src")).as("n_docs"),
        portableRound(sum(col("term")).cast("double"), 4).as("psi"))
  }

  /** Linear-kernel MMD² between two embedding populations — the VECTOR
    * sibling of [[psiDrift]]'s scalar drift score: with the linear
    * kernel, maximum mean discrepancy collapses to ||μ_A − μ_B||², so
    * detecting a train/serve (or source/source) embedding-distribution
    * shift costs exactly ONE pass of per-dimension moment folds — no
    * pairwise kernel matrix, which is what makes MMD tractable at
    * 100 TB (the quadratic-kernel variant adds second-moment folds, the
    * same shape). Elements micro-snap to 1e-6 and fold as exact BIGINTs
    * per (group, dim); the closed form then runs in fixed dimension
    * order, so the readout replays digit-exact in the oracle. Emits one
    * row: group sizes, mmd² and the mean absolute per-dimension mean
    * gap (both 1e-9-snapped — the statistic is a sum of squared
    * mean-gaps, naturally small). */
  def mmdShift(embeddings: DataFrame, group: org.apache.spark.sql.Column,
               dim: Int = 64): DataFrame = {
    require(dim >= 1 && dim <= 4096, s"dim out of range: $dim")
    def micro(c: org.apache.spark.sql.Column) =
      floor(c * 1000000.0 + 0.5).cast("long")
    val aggs =
      Seq(sum(when(group === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(group === 1, 1L).otherwise(0L)).as("n_b")) ++
      (1 to dim).flatMap { d =>
        val e = element_at(col("embedding"), d).cast("double")
        Seq(sum(when(group === 0, micro(e)).otherwise(0L)).as(s"_a$d"),
          sum(when(group === 1, micro(e)).otherwise(0L)).as(s"_b$d"))
      }
    val a = embeddings.agg(aggs.head, aggs.tail: _*)
    def mu(pfx: String, d: Int, n: String) =
      col(s"_$pfx$d").cast("double") / 1000000.0 / col(n).cast("double")
    val diffs = (1 to dim).map(d => mu("a", d, "n_a") - mu("b", d, "n_b"))
    def r9(c: org.apache.spark.sql.Column) =
      floor(c * 1000000000.0 + 0.5) / 1000000000.0
    a.select(col("n_a"), col("n_b"),
      r9(diffs.map(x => x * x).reduce(_ + _)).as("mmd2"),
      r9(diffs.map(abs).reduce(_ + _) / dim).as("mean_abs_gap"))
  }

  /** EST1 — the dedup-rate planning estimator: how much will exact dedup
    * shrink this corpus, answered from a 10% sample BEFORE paying for
    * the full job. The load-bearing design choice is sampling BY CONTENT
    * DIGEST, not by row: all copies of a digest land in or out of a
    * replicate together, so each replicate's 1 − distinct/rows is an
    * unbiased ratio estimate of the corpus rate — row sampling would
    * shear duplicate groups (a doc with 2 copies sampled once looks
    * unique) and systematically UNDERestimate the rate. Ten disjoint
    * digest-hash replicates give the estimate (replicate 0 — what a real
    * planning pass would run), the replicate mean/sd (the error audit),
    * and — because the fixture is small enough to afford it — the exact
    * corpus rate with a within-2-sd verdict. At 100 TB only replicate 0
    * runs; the exact column is this operator's own validation harness.
    *
    * Exactness: replicate rates snap to 1e-6 and the mean/variance fold
    * over ten integer-valued doubles (squares < 1e12 — exact in IEEE),
    * so the whole audit replays digit-exact in the oracle. Scale shape:
    * one digest projection, one (fold, digest)-level distinct aggregate,
    * one 10-row rollup. */
  def dedupRateEstimate(documents: DataFrame, folds: Int = 10): DataFrame = {
    require(folds >= 2 && folds <= 1000, s"folds out of range: $folds")
    val digest = md5(col("text"))
    val fold = Sampling.hashBucket(concat(lit("est1:"), digest), folds)
    val base = documents.select(digest.as("dg"), fold.as("f"))
    def rate(n: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
      floor((lit(1.0) - d.cast("double") / n) * 1000000.0 + 0.5)
    val perFold = base.groupBy(col("f"))
      .agg(count(lit(1)).as("n"), countDistinct(col("dg")).as("d"))
      .select(col("f"), col("n"), rate(col("n"), col("d")).as("rm"))
    val k = folds.toDouble
    val stats = perFold.agg(
      sum(col("n")).as("n_rows"),
      max(when(col("f") === 0, col("n"))).as("n_sampled"),
      max(when(col("f") === 0, col("rm"))).as("est_m"),
      sum(col("rm")).as("s"),
      sum(col("rm") * col("rm")).as("sq"))
    val exact = documents.agg(
      count(lit(1)).as("n_all"),
      countDistinct(md5(col("text"))).as("d_all"))
    stats.crossJoin(exact).select(
      col("n_rows"), col("n_sampled"),
      (rate(col("n_all"), col("d_all")) / 1000000.0).as("exact_rate"),
      (col("est_m") / 1000000.0).as("est_rate"),
      (floor(col("s") / k + 0.5) / 1000000.0).as("rep_mean"),
      (sqrt((col("sq") - col("s") * col("s") / k) / (k - 1.0)) / 1000000.0)
        .as("rep_sd"),
      (abs(rate(col("n_all"), col("d_all")) - floor(col("s") / k + 0.5)) <=
        lit(2.0) * sqrt((col("sq") - col("s") * col("s") / k) / (k - 1.0)))
        .as("within_2sd"))
  }

  /** SFT conversation assembly — the step that turns curated text into
    * supervised fine-tuning examples: segment each document into
    * alternating user/assistant turns, render the chat template, and do
    * the LOSS-MASK accounting (assistant tokens train, user tokens are
    * masked — the trainable fraction is what a data-mix planner budgets
    * on, the SFT analog of pack1's token accounting). Documents too
    * short for one complete user→assistant pair are dropped — a
    * conversation must end on an assistant turn to contribute loss.
    *
    * The fixtures carry no conversation structure, so turn segmentation
    * is a deterministic stand-in: per-doc turn lengths derived from
    * doc_id (user 4 + id%5 tokens, assistant 6 + id%7 — so the trainable
    * fraction varies across docs), full pairs only. The REAL parts — the
    * template render, the mask accounting, the slicing plumbing — are
    * exactly what a real pipeline runs once a turn splitter supplies
    * boundaries (the multimodal-stub discipline: fake the unavailable
    * upstream, make the engine side real and oracle-checked).
    *
    * Scale shape: one projection — token slicing and the per-pair render
    * run inside whole-stage codegen (higher-order transform over a
    * bounded pair count); no shuffle at all. Linear, embarrassingly
    * parallel. */
  def sftAssemble(documents: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val lu = lit(4L) + col("doc_id") % 5
    val la = lit(6L) + col("doc_id") % 7
    val pl = lu + la
    val staged = documents.select(col("doc_id"), t.as("t"), lu.as("lu"),
      la.as("la"), pl.as("pl"),
      floor(size(t).cast("double") / pl).cast("long").as("n_pairs"))
      .filter(col("n_pairs") >= 1)
    val tpl = array_join(
      transform(sequence(lit(0L), col("n_pairs") - 1), p => concat(
        lit("<|user|> "),
        concat_ws(" ", slice(col("t"), (p * col("pl") + 1).cast("int"),
          col("lu").cast("int"))),
        lit(" <|assistant|> "),
        concat_ws(" ", slice(col("t"), (p * col("pl") + col("lu") + 1).cast("int"),
          col("la").cast("int"))))), " ")
    staged.select(col("doc_id"), col("n_pairs"),
      (col("n_pairs") * col("pl")).as("n_tokens_used"),
      (col("n_pairs") * col("la")).as("assistant_tokens"),
      graft.functions.portableRound(
        col("la").cast("double") / col("pl"), 6).as("trainable_frac"),
      tpl.as("template"))
  }

  /** URL canonicalization + dedup — the first stage of a web-corpus
    * pipeline (a CommonCrawl-style crawl re-fetches the same page under
    * case-varied hosts, shuffled query parameters, tracking junk and
    * fragments; dedup BEFORE fetch/parse is the cheapest byte saved).
    * Expects (page_id, url, ts); emits one row per canonical URL with
    * fetch/raw-form counts, the kept page (smallest id — ingest order)
    * and the earliest fetch time.
    *
    * Canonical form: lowercase scheme+host (path case is preserved —
    * paths are case-sensitive per RFC 3986), at most one trailing slash
    * stripped from the path, fragment dropped, `utm_*`/`fbclid` tracking
    * parameters dropped, surviving parameters sorted bytewise. Pure
    * column surgery — split/regexp/higher-order array ops, all
    * whole-stage codegen'd; the only shuffle is the final groupBy on the
    * canonical string. At 100 TB the canonical key should be hashed to a
    * digest before the shuffle if URLs run long — here the canonical URL
    * itself is the (display) group key, and it is bounded (~100 bytes). */
  def urlDedup(fetches: DataFrame): DataFrame =
    fetches
      .select(col("page_id"), col("ts"),
        canonicalUrl(col("url")).as("canonical_url"), col("url"))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_fetches"),
        countDistinct(col("url")).as("n_raw_forms"),
        min(col("page_id")).as("kept_page_id"),
        min(col("ts")).as("first_ts"))

  /** [[urlDedup]]'s canonical form as a reusable column expression (the
    * streaming frontier canonicalizes per micro-batch row before its
    * state merge): lowercase scheme+host, ≤1 trailing slash stripped,
    * fragment dropped, `utm_*`/`fbclid` params dropped, survivors sorted
    * bytewise. */
  def canonicalUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val noFrag = substring_index(url, "#", 1)
    val hostPath = substring_index(noFrag, "?", 1)
    val query = when(instr(noFrag, "?") > 0, substring_index(noFrag, "?", -1))
      .otherwise(lit(""))
    val schemeHost = regexp_extract(hostPath, "^(https?://[^/]+)", 1)
    val path = regexp_replace(
      hostPath.substr(length(schemeHost) + 1, length(hostPath)), "/$", "")
    val kept = array_sort(filter(split(query, "&"), p =>
      !(p.startsWith("utm_") || p.startsWith("fbclid=") || p === "")))
    concat(lower(schemeHost), path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }

  /** Memorization / novelty audit (the McCoy-et-al "how novel is generated
    * text" measurement, run as a corpus job): for every doc in `gen`, the
    * fraction of its token n-gram WINDOWS (instances, not distinct
    * shingles — a doc that repeats a memorized phrase counts it every
    * time) that occur anywhere in `train`, rolled up per source. Output
    * one row per gen source: doc/window/copied counts, corpus-level
    * `novelty` = 1 − copied/windows, and the per-doc novelty mean
    * (both 1e-6-snapped). Docs with fewer than `n` tokens have no
    * windows and are excluded from the audit (not counted as novel).
    *
    * This differs from [[decontaminate]] in both direction and shape:
    * dc1 probes a 100 TB corpus against a broadcast-sized benchmark;
    * here BOTH sides are corpus-scale (the training set vs a generated /
    * held-out corpus), so the membership probe is a shuffle join keyed
    * on the 8-byte [[graft.functions.ShingleHashes]] hash — compact
    * keys, no shingle strings on the wire. Distinct-hash ≡
    * distinct-shingle up to xxhash64 collision; the string-level DuckDB
    * oracle would catch one (dc1's argument). At 100 TB the train side
    * composes with [[decontaminateBloom]]'s filter pre-pass unchanged:
    * Bloom membership has no false negatives, so the confirm join sees
    * only the ~hit-rate fraction of gen windows. Everything else is one
    * per-doc and one per-source hash aggregation — linear end to end. */
  def ngramNovelty(train: DataFrame, gen: DataFrame, n: Int = 3): DataFrame = {
    require(n >= 1 && n <= 16, s"shingle width out of range: $n")
    val sh = graft.functions.shingle_hashes(col("text"), n)
    val trainKeys = train
      .select(explode(array_distinct(sh)).as("sg")).distinct()
      .withColumn("_hit", lit(1L))
    val genWin = gen.select(col("doc_id"), col("source"), explode(sh).as("sg"))
    val perDoc = genWin
      .join(trainKeys, Seq("sg"), "left")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_win"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_copied"))
      .withColumn("doc_novelty", graft.functions.portableRound(
        lit(1.0) - col("n_copied").cast("double") / col("n_win"), 6))
    // the per-doc mean folds as exact micro-unit BIGINTs (doc_novelty is
    // already 1e-6-snapped, so micro(doc_novelty) is an exact integer):
    // both engines divide the same integer sum by the same count — no
    // float accumulation order to diverge on
    perDoc.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_win")).as("n_windows"),
      sum(col("n_copied")).as("n_copied"),
      sum(floor(col("doc_novelty") * 1000000.0 + 0.5).cast("long")).as("_nv"))
      .select(col("source"), col("n_docs"), col("n_windows"), col("n_copied"),
        graft.functions.portableRound(
          lit(1.0) - col("n_copied").cast("double") / col("n_windows"), 6)
          .as("novelty"),
        (floor(col("_nv").cast("double") / col("n_docs") + 0.5) / 1000000.0)
          .as("mean_doc_novelty"))
  }
}
