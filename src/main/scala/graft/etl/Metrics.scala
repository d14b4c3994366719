package graft.etl

import graft.functions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** The reference's run-metrics aggregates A1–A8 (SURVEY.md §2.5;
  * /root/reference/src/lib/users.js:65-79, src/lib/spacex.js:67-80).
  *
  * All global aggregates — one `df.agg(...)` pass, map-side partials then a
  * single-partition reduce: the only shuffle is the final 1-row exchange plus
  * the distinct-count expand, which Spark plans as partial HLL-free
  * hash-distinct. At 100 TB the exact distinct is the expensive one, so the
  * HLL variant ships alongside ([[summaryApprox]]).
  */
object Metrics {

  /** Full metrics row for a customer-shaped enriched table:
    * rows_in (A1), rows_out (A2, conditional), dedup_removed (A3, difference),
    * countries (A4, exact distinct over a coalesced key), last_record (A5,
    * max_by over the explicit ingest order), valid-upcoming analog (A6). */
  def summary(enriched: DataFrame, validCond: Column, distinctKey: Column,
              lastName: Column, orderKey: Column): DataFrame =
    enriched.agg(
      count(lit(1)).as("rows_in"),
      count_if(validCond).as("rows_out"),
      (count(lit(1)) - count_if(validCond)).as("dedup_removed"),
      countDistinct(distinctKey).as("countries"),
      max_by(lastName, orderKey).as("last_record"))

  /** A4 at scale: HLL++ approximate distinct next to the exact count. */
  def summaryApprox(df: DataFrame, distinctKey: Column): DataFrame =
    df.agg(
      countDistinct(distinctKey).as("exact_distinct"),
      approx_count_distinct(distinctKey, 0.01).as("approx_distinct"))

  /** A8 — zero-row fallback (pages/api/etl/restart.js:12): if the extract
    * produced nothing, substitute the mock metrics row. */
  def withFallback(metrics: DataFrame, fallback: DataFrame): DataFrame =
    if (metrics.isEmpty) fallback else metrics

  /** Data-quality audit — the admission gate a pipeline runs before
    * trusting a batch: one row of violation counts for a fact table
    * against its dimension (null FKs, out-of-range measures, duplicate
    * primary keys, orphan FKs with no dimension row).
    *
    * Scale shape: ONE fact scan feeds everything — the scalar checks are
    * map-side conditional counts; duplicates come from the same pass as
    * `count - countDistinct`; orphans are a left-anti join against the
    * dimension KEY COLUMN only (broadcast when the dim fits, id-width
    * shuffle otherwise), counted map-side. No check re-scans the fact. */
  def integrityAudit(fact: DataFrame, dim: DataFrame, factPk: Column,
                     fk: Column, dimPk: Column, measure: Column): DataFrame = {
    val orphans = fact.select(fk.as("_fk"))
      .join(dim.select(dimPk.as("_pk")), col("_fk") === col("_pk"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    fact.agg(
      count(lit(1)).as("n_rows"),
      count_if(fk.isNull).as("n_null_fk"),
      count_if(measure <= 0).as("n_nonpositive"),
      (count(lit(1)) - countDistinct(factPk)).as("n_dup_pk"))
      .crossJoin(orphans)
  }
}
