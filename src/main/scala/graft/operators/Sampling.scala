package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic sampling and dataset splitting — the selection operators a
  * training-data pipeline runs after filtering/dedup.
  *
  * `df.sample()` is seed-dependent AND partitioning-dependent (each task
  * draws from its own stream), so results change under AQE re-plans,
  * repartitioning or a cluster resize — unacceptable for reproducible
  * training sets. Here membership is a pure function of the ROW KEY: an
  * md5-derived bucket in [0, 10000) (engine-portable — any system, including
  * the DuckDB oracle, recomputes it from the key), so a row's sample/split
  * assignment is stable across engines, runs and scales. One projection +
  * filter; no shuffle, no RNG state.
  */
object Sampling {

  /** Pseudo-random bucket in [0, buckets) derived from the key's md5 (first
    * 8 hex chars → int). Engine-portable: DuckDB computes the identical
    * value with `('0x' || substr(md5(k), 1, 8))::BIGINT % buckets`. */
  def hashBucket(key: Column, buckets: Int = 10000): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Keep ~`fraction` of rows, deterministically by key. Stratification is
    * free: the hash is uniform within every subgroup, so per-stratum rates
    * converge to `fraction` without per-group bookkeeping. */
  def deterministicSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    // .round, not .toInt: 0.29*10000 is 2899.999... in binary floating
    // point, and truncation would shift the documented `bucket <
    // fraction·10000` contract by one bucket (datasetSplit rounds too)
    df.filter(hashBucket(key) < (fraction * 10000).round)

  /** Assign each row to a named split by cumulative weight ranges over the
    * hash bucket — the train/val/test assignment that never moves a row
    * between splits when the corpus grows (a row's bucket depends only on
    * its own key). */
  def datasetSplit(df: DataFrame, key: Column,
                   splits: Seq[(String, Double)]): DataFrame = {
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"split weights must sum to 1, got $total")
    val bucket = hashBucket(key)
    val bounds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    // build the CASE from the last range backwards so earlier ranges win
    val assigned = splits.zip(bounds).reverse
      .foldLeft(lit(splits.last._1): Column) { case (acc, ((name, _), hi)) =>
        when(bucket < (hi * 10000).round, lit(name)).otherwise(acc)
      }
    df.withColumn("split", assigned)
  }

  /** Training-mix resampling: keep a deterministic per-source fraction of
    * rows ("oversample curated, downsample crawl"). The keep decision is
    * the same pure hash-of-key predicate as [[deterministicSample]], with
    * the threshold selected per source by a literal CASE — one projection
    * + filter, no shuffle, no RNG, and a row's fate never changes when
    * the corpus grows or the mix of OTHER sources is retuned. Rates > 1
    * are rejected: true oversampling (row duplication) is an explicit
    * epoch-level concern, not a filter's. */
  def mixSources(df: DataFrame, sourceCol: Column, key: Column,
                 rates: Map[String, Double], defaultRate: Double): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "mix rates must be in [0, 1]")
    val threshold = rates.foldLeft(lit((defaultRate * 10000).round): Column) {
      case (acc, (s, r)) => when(sourceCol === s, lit((r * 10000).round)).otherwise(acc)
    }
    df.filter(hashBucket(key) < threshold)
  }

  /** Compute-and-apply a TARGET mixture: keep the largest possible corpus
    * whose source proportions match `targetShares` (water-filling: the
    * scarcest source relative to its target share caps the total, every
    * other source downsamples to proportion), then apply the per-source
    * rates with the same pure hash-of-key membership as [[mixSources]].
    *
    * Unlike mixSources (rates chosen by the caller), the rates here are
    * DERIVED IN-PLAN from the observed source counts: one source-count
    * aggregation (vocabulary-sized), a 1-row min for the cap, a broadcast
    * rate join, one filter projection — so the mix recomputes correctly
    * as the corpus grows, with no driver round-trip. Sources absent from
    * `targetShares` drop; a targeted source with no rows makes its share
    * unsatisfiable and is ignored by the cap (documented, not an error).
    * Rounding: thresholds fix at bucket resolution (1e-4) so both engines
    * keep identical rows. */
  def targetMix(df: DataFrame, sourceCol: Column, key: Column,
                targetShares: Map[String, Double]): DataFrame = {
    require(targetShares.nonEmpty, "targetShares must not be empty")
    val total = targetShares.values.sum
    require(math.abs(total - 1.0) < 1e-9, s"target shares must sum to 1, got $total")
    require(targetShares.values.forall(_ > 0), "target shares must be positive")
    val counts = df.groupBy(sourceCol.as("_src")).agg(count(lit(1)).as("_n"))
      .withColumn("_t", targetShares.foldLeft(lit(0.0)) { case (acc, (s, t)) =>
        when(col("_src") === s, lit(t)).otherwise(acc)
      })
    val cap = counts.filter(col("_t") > 0)
      .agg(min(col("_n").cast("double") / col("_t")).as("_cap"))
    val rates = counts.crossJoin(broadcast(cap))
      .select(col("_src"),
        when(col("_t") > 0,
          floor(col("_t") * col("_cap") / col("_n").cast("double") * 10000 + 0.5))
          .otherwise(lit(0.0)).cast("long").as("_thresh"))
    df.join(broadcast(rates), sourceCol === col("_src"))
      .filter(hashBucket(key) < col("_thresh"))
      .drop("_src", "_thresh")
  }

  /** Stratified sample with an exact per-stratum CAP: deterministically
    * keep at most `cap` rows from every `stratumCol` group ("120 docs per
    * language"), chosen by md5-of-key order so membership is a pure
    * function of the row's own key — stable across engines, runs and
    * layouts, like every sampler here.
    *
    * Rate-based stratified sampling falls out of [[mixSources]]; the cap
    * form needs a per-group rank, which runs on the native top-k-per-key
    * physical operator (bounded heap per group, one shuffle, no sort of
    * the full stratum — the window-rank formulation would sort every
    * group end-to-end at 100 TB). */
  def stratifiedCap(df: DataFrame, stratumCol: String, keyCol: String,
                    cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    graft.plans.TopKPerKey(
      df.withColumn("_h", md5(col(keyCol).cast("string"))),
      Seq(stratumCol), Seq(("_h", true), (keyCol, true)), cap)
      .drop("_h")
  }

  /** Epoch-level oversampling mix: the row-DUPLICATION counterpart to
    * [[mixSources]] (which caps rates at 1 and points here for true
    * oversampling). Rates may exceed 1: a rate of 2.5 emits every row
    * twice plus a deterministic half of the source a third time — the
    * "epochs per source" weighting published corpus recipes use for
    * small-but-high-quality sources. Each emitted row carries a `copy`
    * index (1..k), so downstream consumers can still dedup or shard by
    * (key, copy).
    *
    * Copy counts are `⌊rate⌋ + [hash(key) < frac]` with a dedicated
    * `ov:` salt — a pure function of the row key, independent of every
    * other sampler's verdict on the same key. Plan shape: a literal CASE
    * projection + `explode(sequence(1, k))` — narrow end to end, no
    * shuffle, output exactly Σ_s rate_s·n_s rows (±hash granularity). */
  def oversampleMix(df: DataFrame, sourceCol: Column, key: Column,
                    rates: Map[String, Double], defaultRate: Double): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(_ >= 0),
      "oversample rates must be >= 0")
    val rate = rates.foldLeft(lit(defaultRate): Column) {
      case (acc, (s, r)) => when(sourceCol === s, lit(r)).otherwise(acc)
    }
    val frac = floor((rate - floor(rate)) * 10000 + 0.5).cast("long")
    val extra = when(
      hashBucket(concat(lit("ov:"), key.cast("string"))) < frac, 1L).otherwise(0L)
    df.withColumn("_copies", floor(rate).cast("long") + extra)
      .filter(col("_copies") > 0)
      .withColumn("copy", explode(sequence(lit(1L), col("_copies"))))
      .drop("_copies")
  }

  /** Temperature-scaled source mixing (the multilingual-sampling rule from
    * the mBERT/XLM-R line of work, τ-scaling, public): resample so the kept
    * corpus's source proportions follow p_s^τ renormalized — τ=1 keeps the
    * natural distribution, τ→0 flattens toward uniform, τ=0.5 is the
    * common compromise that up-weights small sources without drowning
    * large ones. Unlike [[targetMix]] (caller-chosen shares), the shares
    * here are DERIVED from the observed counts, entirely in-plan.
    *
    * The math is arranged to be order-free for engine parity: the kept
    * count for source s is `C·n_s^τ` with `C = min_t n_t^(1−τ)` (the
    * normalizing Σp^τ cancels out of the keep-rate, so no float sum over
    * sources exists anywhere — only a `min`, which is order-safe). The
    * smallest source keeps rate 1 exactly; every larger source downsamples
    * toward the tempered share. τ=0.5 routes through `sqrt` (IEEE
    * correctly-rounded in every engine) rather than `pow` (libm-dependent),
    * so the registered query's thresholds are bit-identical in the oracle.
    *
    * Plan shape at 100 TB: one source-cardinality count aggregation, a
    * 1-row min, a broadcast rate join, one map-side hash filter — the
    * corpus itself is scanned once and never shuffled. */
  def temperatureMix(df: DataFrame, sourceCol: Column, key: Column,
                     tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0, 1], got $tau")
    def tempered(n: Column): Column =
      if (tau == 1.0) n else if (tau == 0.5) sqrt(n) else pow(n, tau)
    val counts = df.groupBy(sourceCol.as("_src"))
      .agg(count(lit(1)).cast("double").as("_n"))
      .withColumn("_w", tempered(col("_n")))
    val cap = counts.agg(min(col("_n") / col("_w")).as("_cap")) // min n^(1−τ)
    val rates = counts.crossJoin(broadcast(cap))
      .select(col("_src"),
        floor(col("_cap") * col("_w") / col("_n") * 10000 + 0.5)
          .cast("long").as("_thresh"))
    df.join(broadcast(rates), sourceCol === col("_src"))
      .filter(hashBucket(key) < col("_thresh"))
      .drop("_src", "_thresh")
  }

  /** CTX1 — long-context data mixing: raise the share of TOKENS that come
    * from long documents to `targetLongShare` by deterministically
    * downsampling SHORT documents — the data-mix move of long-context
    * extension recipes (continued pretraining on length-upsampled data;
    * e.g. Fu et al. 2024 "Data Engineering for Scaling Language Models
    * to 128K Context", Gao et al. 2024 ProLong — both resample the
    * length distribution rather than synthesize long text). One-sided by
    * design: long documents are never dropped and nothing is duplicated
    * (mix4's stance) — if the corpus already meets the target the op is
    * a no-op with the achieved share reported honestly.
    *
    * The short-bucket keep rate solves long/(long + r·short) = s exactly:
    * r = long·(1−s)/(s·short), snapped to the 1e-4 hash grid, capped at
    * 1; membership is the same pure key-hash predicate as every sampler
    * here. Output: one row per length bucket with before/after doc and
    * token counts, the keep rate, and the achieved long share.
    *
    * Scale shape: one corpus projection + one 2-row token-mass
    * aggregate (broadcast back) + one bucket rollup — the flagged frame
    * has two consumers folded into ONE aggregation (the rollup), and
    * the achieved-share join-back runs on the 2-row frame
    * (localCheckpoint'ed: Spark does not dedup cross-branch subplans —
    * the pref1 lesson, paid here on 2 rows instead of the corpus). */
  def lengthMix(documents: DataFrame, key: Column, nTokens: Column,
                longMin: Long = 64, targetLongShare: Double = 0.75,
                salt: String = "ctx1"): DataFrame = {
    require(longMin >= 1, s"longMin must be positive, got $longMin")
    require(targetLongShare > 0 && targetLongShare < 1,
      s"targetLongShare in (0,1): $targetLongShare")
    val base = documents.select(key.cast("string").as("k"),
        nTokens.cast("long").as("n_tok"))
      .withColumn("bucket",
        when(col("n_tok") >= longMin, "long").otherwise("short"))
      .withColumn("hb", hashBucket(concat(lit(s"$salt:"), col("k"))))
    val tot = base.groupBy().agg(
      sum(when(col("bucket") === "long", col("n_tok")).otherwise(0L))
        .as("long_tok"),
      sum(when(col("bucket") === "short", col("n_tok")).otherwise(0L))
        .as("short_tok"))
    val rRaw = col("long_tok").cast("double") * (1.0 - targetLongShare) /
      (lit(targetLongShare) * col("short_tok").cast("double"))
    val thresh = when(col("short_tok") === 0L, 10000L)
      .otherwise(least(lit(10000L), floor(rRaw * 10000 + 0.5).cast("long")))
    val flagged = base
      .crossJoin(broadcast(tot.select(thresh.as("thresh"))))
      .withColumn("kept",
        col("bucket") === "long" || col("hb") < col("thresh"))
    val agg = flagged.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("kept_docs"),
        sum(when(col("kept"), col("n_tok")).otherwise(0L)).as("kept_tokens"),
        max(col("thresh")).as("th"))
      .localCheckpoint() // 2-row frame, two consumers below
    val keptTot = agg.agg(
      sum(col("kept_tokens")).as("kt"),
      sum(when(col("bucket") === "long", col("kept_tokens")).otherwise(0L))
        .as("klt"))
    agg.crossJoin(broadcast(keptTot))
      .select(col("bucket"), col("n_docs"), col("n_tokens"),
        col("kept_docs"), col("kept_tokens"),
        when(col("bucket") === "long", 1.0)
          .otherwise(col("th").cast("double") / 10000.0).as("keep_rate"),
        graft.functions.portableRound(
          col("klt").cast("double") / col("kt"), 6).as("achieved_long_share"))
  }

  /** Deterministic epoch shuffle: the training-order manifest a pretraining
    * run reads instead of shuffling 100 TB at epoch start. Each row gets a
    * `shard` and a dense position within it, both pure functions of
    * `(epoch, key)` via salted md5 — so the order is (a) reproducible
    * across engines/runs/layouts, (b) DIFFERENT every epoch (the salt
    * includes the epoch number), and (c) resumable mid-epoch from
    * `(shard, pos)` alone. Shard and position use independent salts, so
    * shard membership carries no information about within-shard order.
    *
    * Plan shape: one hash-partition exchange on `shard` plus a per-shard
    * sort — never a global single-partition sort. `shards` is the
    * parallelism knob: at 100 TB you run tens of thousands of shards, each
    * a few GB, and trainers stream shards independently. */
  def epochShuffle(df: DataFrame, key: Column, epoch: Int,
                   shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val k = key.cast("string")
    val shard = hashBucket(concat(lit(s"ep$epoch-sh:"), k), shards)
    val ord = hashBucket(concat(lit(s"ep$epoch-ord:"), k), 100000000)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(ord.asc, key.asc)
    df.withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Temporal train/embargo/test split with leakage audit — the
    * time-series holdout [[datasetSplit]] (hash) and `groupSplit`
    * (entity) cannot express: train on the first `trainPct`% of the
    * TIME RANGE, hold an `embargoPct`% gap so boundary-window features
    * cannot peek across the cut, test on the rest. Cuts are integer
    * microseconds (t0 + (t1−t0)·pct div 100 — exact cross-engine).
    * Output is the per-split audit a pipeline publishes: event/user
    * counts, actual span, and `leak_users` — how many of the split's
    * users ALSO appear in train (the user-overlap that an entity-level
    * split would remove; reported so the residual risk is a number, not
    * a hope). By definition train's own overlap is its user count.
    *
    * Shape: one 1-row bounds aggregate broadcast back; split assignment
    * is an in-row projection; counts are one map-side-combinable rollup
    * + one user-keyed semi-join for the audit. */
  def temporalSplit(events: DataFrame, trainPct: Int = 70,
                    embargoPct: Int = 10): DataFrame = {
    require(trainPct > 0 && embargoPct >= 0 && trainPct + embargoPct < 100,
      s"need 0 < trainPct, 0 <= embargoPct, trainPct+embargoPct < 100: " +
        s"$trainPct, $embargoPct")
    val tsu = unix_micros(col("ts"))
    val b = events.agg(min(tsu).as("t0"), max(tsu).as("t1"))
    val cut1 = col("t0") + expr(s"((t1 - t0) * $trainPct) div 100")
    val cut2 = col("t0") + expr(s"((t1 - t0) * ${trainPct + embargoPct}) div 100")
    val tagged = events.select(col("user_id"), tsu.as("us"))
      .crossJoin(broadcast(b))
      .withColumn("split",
        when(col("us") <= cut1, "train")
          .when(col("us") <= cut2, "embargo").otherwise("test"))
    val trainUsers = tagged.filter(col("split") === "train")
      .select(col("user_id")).distinct()
    val leak = tagged.join(trainUsers, Seq("user_id"), "left_semi")
      .groupBy(col("split"))
      .agg(countDistinct(col("user_id")).as("leak_users"))
    tagged.groupBy(col("split"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("us")).as("first_us"), max(col("us")).as("last_us"))
      .join(leak, Seq("split"), "left")
      .withColumn("leak_users", coalesce(col("leak_users"), lit(0L)))
  }

  /** Curriculum training order: easy-to-hard annealing over
    * [[TextAnalysis.perplexityBuckets]]' quality partition — all head
    * (most fluent) documents first, then middle, then tail, with a
    * salted shuffle WITHIN each band (deterministic, epoch-style) so the
    * curriculum fixes only the macro order while micro order stays
    * decorrelated. A trainer consumes shards in (bucket, shard, pos)
    * order; resumption is a pure key lookup.
    *
    * Shape: ppl1's exchanges + ONE window keyed (bucket, shard) — never
    * global; each band's shards order independently at any corpus size. */
  def curriculumOrder(documents: DataFrame, shards: Int = 8): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val b = TextAnalysis.perplexityBuckets(documents)
      .select(col("doc_id"), col("lang"), col("bucket_id"), col("bucket"))
    val k = col("doc_id").cast("string")
    val shard = hashBucket(concat(lit("cur-sh:"), k), shards)
    val ord = hashBucket(concat(lit("cur-ord:"), k), 100000000)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket_id"), col("shard"))
      .orderBy(ord.asc, col("doc_id").asc)
    b.withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Sequence-packing manifest: where each document lands in the
    * fixed-capacity concatenated token stream a pretraining run feeds the
    * model. Documents are sharded and ordered exactly like
    * [[epochShuffle]] (salted-md5 shard + independent salted-md5 order —
    * reproducible across engines/runs/layouts), then each shard's token
    * counts accumulate into a running stream position: a document starting
    * at `start_tok` with `n_tok` tokens occupies sequences
    * `start_tok / capacity .. (start_tok + n_tok - 1) / capacity` — the
    * standard concat-and-cut packing (GPT-style), where documents may
    * straddle a sequence boundary; `straddles` flags those so a loader can
    * mask cross-document attention. Emitted per doc: shard, position,
    * stream offset, first sequence id, offset within it, and the straddle
    * flag — the complete manifest, no token material moved.
    *
    * Plan shape: one token-count projection, ONE hash exchange on `shard`,
    * a per-shard sort + running sum (never a global sort) — identical to
    * epochShuffle's cost. `shards` is the parallelism knob: at 100 TB you
    * pack tens of thousands of shards independently and trainers stream
    * them; sequence ids are shard-local by construction. */
  def packSequences(df: DataFrame, key: Column, nTokens: Column,
                    capacity: Int, shards: Int,
                    salt: String = "pack0"): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(shards > 0, s"shards must be positive, got $shards")
    val k = key.cast("string")
    val shard = hashBucket(concat(lit(s"$salt-sh:"), k), shards)
    val ord = hashBucket(concat(lit(s"$salt-ord:"), k), 100000000)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("_ord").asc, key.asc)
    df.withColumn("shard", shard)
      .withColumn("_ord", ord)
      .withColumn("n_tok", nTokens.cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("start_tok",
        coalesce(sum(col("n_tok")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      // floor division via subtract-mod-then-divide: the numerator is an
      // exact multiple of capacity, so the double division is EXACT — no
      // float-floor boundary case for any capacity (DuckDB mirrors with
      // integer `//`)
      .withColumn("seq_offset", pmod(col("start_tok"), lit(capacity.toLong)))
      .withColumn("seq_id",
        ((col("start_tok") - col("seq_offset")) / capacity).cast("long"))
      .withColumn("straddles", {
        val last = col("start_tok") + col("n_tok") - 1
        ((last - pmod(last, lit(capacity.toLong))) / capacity).cast("long") >
          col("seq_id")
      })
      .drop("_ord")
  }

  /** Materialize ONE shard of [[packSequences]]' manifest into the actual
    * fixed-capacity token sequences a trainer loads — the manifest's
    * zm1-moment: the plan is only trustworthy once bytes obey it, and
    * this is the operator that makes them. Each document's tokens land at
    * stream position `start_tok + i`; a sequence is the `capacity`-sized
    * cut of that stream, so every sequence except the shard's last holds
    * exactly `capacity` tokens and straddling documents continue into the
    * next sequence — precisely the concat-and-cut layout the manifest's
    * `seq_id`/`seq_offset`/`straddles` columns describe.
    *
    * Shape: the shard's manifest (same one exchange as packSequences) +
    * one posexplode projection + ONE hash aggregation on `seq_id` whose
    * per-group state is bounded by `capacity` — corpus-linear, and shards
    * materialize independently (the parallelism unit at 100 TB). */
  def materializeShard(df: DataFrame, key: Column, tokens: Column,
                       capacity: Int, shards: Int, shard: Int,
                       salt: String = "pack0"): DataFrame = {
    require(shard >= 0 && shard < shards,
      s"shard must be in [0, $shards), got $shard")
    val manifest = packSequences(df.withColumn("_toks", tokens), key,
      size(col("_toks")), capacity, shards, salt)
      .filter(col("shard") === shard)
    manifest
      .select(col("start_tok"), posexplode(col("_toks")).as(Seq("_p", "_tok")))
      .withColumn("_sp", col("start_tok") + col("_p"))
      .withColumn("_off", pmod(col("_sp"), lit(capacity.toLong)))
      .withColumn("seq_id",
        ((col("_sp") - col("_off")) / capacity).cast("long"))
      .groupBy(col("seq_id"))
      .agg(array_sort(collect_list(struct(col("_off"), col("_tok")))).as("_s"))
      .select(col("seq_id"),
        transform(col("_s"), s => s.getField("_tok")).as("tokens"),
        size(col("_s")).cast("long").as("n_tokens"))
  }

  /** Non-straddling sequence packing — [[packSequences]]' sibling for
    * loaders that cannot mask cross-document attention: documents are
    * sharded and ordered EXACTLY like packSequences (same salted-md5
    * shard and order), but a document that would cross a sequence
    * boundary starts a fresh sequence instead (greedy next-fit).
    * Documents longer than `capacity` are truncated to it (flagged
    * `truncated`) so the no-straddle invariant is total. Emits the same
    * manifest shape plus `eff_tok` (tokens actually packed) and the
    * truncation flag; `seq_offset + eff_tok <= capacity` on every row.
    *
    * This is the ONE packing variant that is genuinely a sequential fold:
    * each placement depends on the running fill of the current sequence
    * (a window sum cannot express reset-on-overflow), so the per-shard
    * scan is imperative — the documented mapPartitions case. Rows are
    * hash-clustered by shard and (shard, pos)-sorted within partitions
    * first; state is three longs per shard, shards stay the independent
    * parallelism unit, and nothing collects. The DuckDB oracle replays
    * the fold as a recursive CTE advancing all shards in lockstep. */
  def packSequencesNoStraddle(df: DataFrame, key: Column, nTokens: Column,
                              capacity: Int, shards: Int,
                              salt: String = "pack0"): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(shards > 0, s"shards must be positive, got $shards")
    val k = key.cast("string")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("_ord").asc, key.asc)
    val slim = df
      .withColumn("shard", hashBucket(concat(lit(s"$salt-sh:"), k), shards))
      .withColumn("_ord", hashBucket(concat(lit(s"$salt-ord:"), k), 100000000))
      // the fold below reads n_tok/eff_tok with getLong — a null token
      // count (e.g. null text) must fail loudly here, not NPE in a task
      .withColumn("n_tok", when(nTokens.cast("long").isNull, raise_error(lit(
          "packSequencesNoStraddle: null nTokens — every document needs a " +
            "token count"))).otherwise(nTokens.cast("long")))
      .withColumn("eff_tok", least(col("n_tok"), lit(capacity.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("shard"), col("pos"), key.as("pk"),
        col("n_tok"), col("eff_tok"))
    val parted = slim.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
    val cap = capacity.toLong
    val rdd = parted.rdd.mapPartitions { it =>
      var curShard = Long.MinValue
      var seq = 0L
      var fill = 0L
      it.map { r =>
        val sh = r.getLong(0)
        val eff = r.getLong(4)
        if (sh != curShard) { curShard = sh; seq = 0L; fill = 0L }
        if (fill + eff > cap) { seq += 1; fill = 0L }
        val off = fill
        fill += eff
        org.apache.spark.sql.Row(sh, r.getLong(1), r.get(2), r.getLong(3),
          eff, seq, off, r.getLong(3) > cap)
      }
    }
    import org.apache.spark.sql.types._
    df.sparkSession.createDataFrame(rdd, StructType(Seq(
      StructField("shard", LongType, nullable = false),
      StructField("pos", LongType, nullable = false),
      slim.schema("pk").copy(name = "pk"),
      StructField("n_tok", LongType, nullable = false),
      StructField("eff_tok", LongType, nullable = false),
      StructField("seq_id", LongType, nullable = false),
      StructField("seq_offset", LongType, nullable = false),
      StructField("truncated", BooleanType, nullable = false))))
  }

  /** Cumulative Poisson(1) probabilities, snapped to 9 decimals — the SAME
    * literals are embedded in the DuckDB oracle, so the inverse-CDF ladder
    * is engine-portable by construction. P(X > 8) ≈ 1.1e-6 rides in the
    * last rung. */
  private[graft] val poisson1Cum: Seq[Double] = {
    val e1 = math.exp(-1.0)
    val raw = (0 to 8).scanLeft(0.0) { (acc, k) =>
      acc + e1 / (1 to k).foldLeft(1.0)(_ * _)
    }.tail
    raw.map(c => math.floor(c * 1e9 + 0.5) / 1e9)
  }

  /** Deterministic Poisson bootstrap — the standard one-pass resampling
    * scheme for distributed data (each row draws an independent
    * Poisson(1) multiplicity per replicate instead of the classic
    * draw-n-of-n, which needs global coordination): `b` replicate means
    * of a cent-exact measure, from which the caller reads a bootstrap CI.
    * The multiplicity is a pure salted-hash function of (replicate, key):
    * reproducible across engines, runs and layouts, like every sampler
    * here.
    *
    * Determinism: u comes from the md5 bucket grid (1e-6 resolution); the
    * inverse-CDF ladder compares against [[poisson1Cum]]'s snapped
    * literals; replicate sums are exact integer folds (Σ w·cents, Σ w as
    * longs) — the only doubles are the final division and round.
    *
    * Scale shape: NO row blowup at all — all `b` replicate draws are
    * computed as in-row expressions (one md5 per digest-group per row,
    * four 8-hex uniform windows per digest, same bits the DuckDB oracle
    * reads), and all 2·b replicate sums ride in ONE map-side-combinable
    * aggregate over the un-exploded scan. The only post-scan work is
    * unpivoting the single 2·b-column result row into `b` output rows.
    * One scan, one 1-row exchange, any corpus size — the reason Poisson
    * bootstrap IS the large-scale bootstrap. (The previous form exploded
    * ×b/4 before aggregating; same draws, ~b/4× the row volume under the
    * aggregate.) */
  def bootstrapMeans(df: DataFrame, key: Column, cents: Column,
                     b: Int = 32): DataFrame = {
    require(b >= 4 && b % 4 == 0, s"b must be a positive multiple of 4, got $b")
    // one md5 feeds FOUR replicates (8 hex chars = 32 uniform bits each):
    // the digest is the dominant per-row cost, and 128 independent bits
    // buy four draws, not one — b/4 digests per input row, all inside ONE
    // compiled kernel (a 32-column when-ladder projection blew the 64 KB
    // Janino method limit and fell back to interpreted eval)
    val proj = df.select(cents.as("_c"),
      graft.functions.poisson_bootstrap_weights(
        key.cast("string"), b, poisson1Cum).as("_ws"))
    val aggExprs = (0 until b).flatMap { rep =>
      Seq(sum(col("_ws").getItem(rep)).as(s"_n$rep"),
        sum(col("_ws").getItem(rep) * col("_c")).as(s"_s$rep"))
    }
    val one = proj.agg(aggExprs.head, aggExprs.tail: _*)
    // unpivot the 1-row, 2b-column aggregate into b output rows — b tiny
    // structs, nothing data-sized
    val pairs = array((0 until b).map(rep =>
      struct(lit(rep.toLong).as("rep"), col(s"_n$rep").as("n"),
        col(s"_s$rep").as("s"))): _*)
    one.select(explode(pairs).as("r"))
      .select(col("r.rep").as("replicate"), col("r.n").as("n_resampled"),
        graft.functions.portableRound(
          col("r.s").cast("double") / col("r.n").cast("double") / 100.0, 4)
          .as("mean_price"))
  }

  /** Deterministic weighted sample WITHOUT replacement of exactly `k` rows
    * (Efraimidis–Spirakis exponential race): each row draws an Exp(weight)
    * race key from an md5-derived uniform — key = −ln(u)/w, the k smallest
    * win — so inclusion odds are proportional to weight, and the whole
    * draw is a pure function of the keys (stable across engines, runs,
    * partition layouts; re-runs and the DuckDB oracle replay it
    * bit-for-bit).
    *
    * Portability is engineered, not assumed: u comes from 48 exact md5
    * bits (so the uniform is the same double everywhere), the single libm
    * call (ln, correct to ~1 ulp but not bit-specified) is rounded to the
    * 1e-8 grid BEFORE the IEEE-exact division by the weight, so two
    * engines cannot disagree on rank order; ties (and u=0 → key=∞) break
    * on the key column.
    *
    * Plan shape: one projection + TakeOrdered — per-partition k-heaps,
    * only k rows leave each partition; no global sort, no RNG state. At
    * 100 TB the race scans once and ships k·partitions candidates. */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
                     k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = conv(substring(md5(key.cast("string")), 1, 12), 16, 10)
      .cast("long").cast("double") / 281474976710656.0 // 2^48, exact division
    val race = graft.functions.portableRound(-log(u), 8) / weight.cast("double")
    df.withColumn("_race", race)
      .orderBy(col("_race").asc, key.asc)
      .limit(k)
      .drop("_race")
  }

  /** PAD1 — the sorted-batching padding audit: how many pad tokens does a
    * fixed-size training batch burn under hash-order batching vs
    * length-sorted batching? Per strategy: batch count, real tokens,
    * padded tokens (Σ per-batch max·size — what the accelerator actually
    * processes) and the pad fraction. Sorting within a shard is the
    * classic bucketed-batching trick; this op MEASURES the win on the
    * corpus instead of assuming it, which is the number that decides
    * whether a loader adds the sort.
    *
    * Both strategies batch within the SAME salted hash shards (pack1's
    * discipline: batching is sequential only within a shard, shards are
    * the parallelism unit — no global window anywhere), so the
    * comparison isolates the ordering choice. Plan: one projection, one
    * shard exchange reused by both orderings, per-shard windows, two
    * bounded rollups. */
  def paddingAudit(documents: DataFrame, batchSize: Int = 8,
                   shards: Int = 8, salt: String = "pad1"): DataFrame = {
    require(batchSize >= 1 && shards >= 1, s"bad params: $batchSize/$shards")
    val base = documents.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok"),
      hashBucket(concat(lit(s"$salt-sh:"), col("doc_id").cast("string")),
        shards).as("shard"),
      hashBucket(concat(lit(s"$salt-ord:"), col("doc_id").cast("string")),
        100000000).as("_ord"))
    def strat(name: String, order: Seq[org.apache.spark.sql.Column]) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard")).orderBy(order: _*)
      base.withColumn("rn", row_number().over(w))
        .withColumn("batch", floor((col("rn") - 1) / batchSize).cast("long"))
        .groupBy(col("shard"), col("batch"))
        .agg(count(lit(1)).as("bsz"), max(col("n_tok")).as("mx"),
          sum(col("n_tok")).as("real"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("real")).as("real_tokens"),
          sum(col("mx") * col("bsz")).as("padded_tokens"))
        .select(lit(name).as("strategy"), col("n_batches"),
          col("real_tokens"), col("padded_tokens"),
          graft.functions.portableRound(lit(1.0) -
            col("real_tokens").cast("double") / col("padded_tokens"), 6)
            .as("pad_frac"))
    }
    strat("hash_order", Seq(col("_ord").asc, col("doc_id").asc))
      .unionByName(
        strat("length_sorted", Seq(col("n_tok").asc, col("doc_id").asc)))
  }
}
