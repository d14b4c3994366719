#!/usr/bin/env python3
"""Repeatable 10x-scale guard (SCALE.md "sfx10" sweep, one command).

Round 7's one-off sweep caught a silent n^2/2^planes quadratic that had
sat invisible for four rounds (d6's pinned LSH plane count, 185x wall
clock at 10x data). This tool makes that check cheap enough to run every
round: it synthesizes a structure-preserving 10x copy of the sf0.1
fixtures the subset needs, times a 6-query canary-scale subset at both
scales (rep-min of 2 runs each, through graft.Bench's noop-write
harness), and fails if any 10x-data ratio exceeds the bound.

Usage:
    python3 tools/scale_sweep.py [--bound 9] [--sf01 DIR] [--x10 DIR]

Synthesis (mirrors SCALE.md section "sf1-equivalent validation"):
  - embeddings x10: replica k offsets vec_id by k*n and flips the sign
    of dimension i iff popcount(i & k) is odd — a Hadamard-style
    orthogonal transform, so within-replica geometry is EXACT and
    cross-replica cosine ~ 0 (near-dup/ANN structure grows linearly,
    like an organically larger corpus).
  - documents x10: replica k offsets doc_id by k*n and suffixes every
    whitespace token with "_k" (k>0), pushing cross-replica shingle
    Jaccard to 0 while preserving within-replica dup structure verbatim.
  - part x10: keys offset per replica, every other column VERBATIM — the
    10x-repeated names are the identical-name hot-block stress for the
    entity-resolution row, deliberately adversarial.

Validation data only — correctness oracles always run against the
driver fixtures.
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

SUBSET = [
    "d6_production",      # cost-ranked LSH at the 0.8 corpus-dedup threshold
    "sim2_production",    # corpus-adaptive ANN over the planted corpus
    "d8_keep_best",       # pair rounds + one argmax exchange (linear claim)
    "d9_semantic_dedup",  # sign buckets + multiprobe + CC (linear x polylog)
    "kmeans1_lloyd",      # rounds x N (linear claim)
    "er2_star_resolve",   # bounded-output ER on the VERBATIM-name replicas —
                          # the exact hot-block shape that put er1 (the
                          # clique form, known-quadratic output) at 15x
    "dsir1_importance",   # two token scans + 128-row model tables + one
                          # doc rollup (linear claim; round-8 addition)
    "d11_containment",    # df-bounded span-blocked pair generation — the
                          # round-8 op whose pair work COULD go quadratic
                          # if the df ceiling failed to bound it
]
TABLES = {"embeddings", "documents", "part"}  # all the subset reads


def synthesize(src: str, dst: str, force: bool) -> None:
    import duckdb
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    key_of = {"embeddings": "vec_id", "documents": "doc_id", "part": "p_partkey"}
    for table in sorted(TABLES):
        out = os.path.join(dst, f"{table}.parquet")
        src_file = f"{src}/{table}.parquet"
        n, off = con.execute(
            f"SELECT count(*), max({key_of[table]}) + 1 FROM '{src_file}'"
        ).fetchone()
        if os.path.exists(out) and not force:
            # the driver regenerates the source fixtures at will: a cached
            # x10 of an OLDER generation would make the ratio meaningless,
            # so reuse only if the source hasn't changed since synthesis
            # (mtime) and the row contract still holds
            fresh = os.path.getmtime(out) > os.path.getmtime(src_file)
            n10 = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
            if fresh and n10 == 10 * n:
                print(f"[synth] {table}: up to date, keeping "
                      f"(use --force to rebuild)")
                continue
            print(f"[synth] {table}: stale (source regenerated or row "
                  f"mismatch {n10} != 10*{n}), rebuilding")
        if table == "embeddings":
            sql = f"""
            COPY (
              SELECT e.vec_id + k.k * {off} AS vec_id,
                     CAST([CASE WHEN bit_count(CAST(i - 1 AS BIGINT) & k.k) % 2 = 1
                                THEN -e.embedding[i] ELSE e.embedding[i] END
                           FOR i IN RANGE(1, 1 + len(e.embedding))] AS FLOAT[]) AS embedding,
                     e.label
              FROM '{src}/embeddings.parquet' e
              CROSS JOIN (SELECT unnest(range(10)) AS k) k
              ORDER BY vec_id
            ) TO '{out}' (FORMAT PARQUET)"""
        elif table == "part":
            # keys offset per replica, every OTHER column VERBATIM — names
            # repeating 10x across replicas is the adversarial
            # identical-name hot-block shape for entity resolution
            cols = [r[0] for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/part.parquet'").fetchall()]
            passthrough = ", ".join(
                f"p.{c}" for c in cols if c != "p_partkey")
            sql = f"""
            COPY (
              SELECT p.p_partkey + k.k * {off} AS p_partkey, {passthrough}
              FROM '{src}/part.parquet' p
              CROSS JOIN (SELECT unnest(range(10)) AS k) k
              ORDER BY p_partkey
            ) TO '{out}' (FORMAT PARQUET)"""
        else:  # documents
            cols = [r[0] for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/documents.parquet'").fetchall()]
            passthrough = ", ".join(
                f"d.{c}" for c in cols if c not in ("doc_id", "text"))
            sql = f"""
            COPY (
              SELECT d.doc_id + k.k * {off} AS doc_id,
                     CASE WHEN k.k = 0 THEN d.text
                          ELSE array_to_string(
                            list_transform(string_split(d.text, ' '),
                                           t -> t || '_' || CAST(k.k AS VARCHAR)), ' ')
                     END AS text,
                     {passthrough}
              FROM '{src}/documents.parquet' d
              CROSS JOIN (SELECT unnest(range(10)) AS k) k
              ORDER BY doc_id
            ) TO '{out}' (FORMAT PARQUET)"""
        con.execute(sql)
        n10 = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        assert n10 == 10 * n, f"{table}: {n10} != 10*{n}"
        print(f"[synth] {table}: {n} -> {n10} rows")


def bench_once(sf_dir: str, out_file: str) -> dict:
    # Bench swallows artifact-write failures (stderr + exit 0); never let
    # a stale file from a previous sweep satisfy the existence check
    if os.path.exists(out_file):
        os.remove(out_file)
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"),
               SPARK_GRAFT_BENCH_ONLY=",".join(SUBSET),
               SPARK_GRAFT_BENCH_OUT=out_file)
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       env=env, capture_output=True, text=True)
    if r.returncode != 0 or not os.path.exists(out_file):
        sys.stderr.write(r.stdout[-4000:] + r.stderr[-4000:])
        raise SystemExit(f"bench run failed for {sf_dir}")
    with open(out_file) as f:
        d = json.load(f)
    if d["errors"]:
        raise SystemExit(f"bench errors at {sf_dir}: {d['errors']}")
    return d["queries"]


def rep_min(sf_dir: str, tag: str, reps: int) -> dict:
    runs = []
    for i in range(reps):
        out = os.path.join(tempfile.gettempdir(), f"sweep_{tag}_{i}.json")
        q = bench_once(sf_dir, out)
        print(f"[bench] {tag} rep {i}: " +
              " ".join(f"{k}={v:.2f}" for k, v in q.items()))
        runs.append(q)
    return {k: min(r[k] for r in runs) for k in runs[0]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bound", type=float, default=9.0,
                    help="max allowed 10x-data wall-clock ratio")
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument("--x10", default="/tmp/sfx10_sweep")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--force", action="store_true",
                    help="rebuild the synthesized fixtures")
    args = ap.parse_args()

    synthesize(args.sf01, args.x10, args.force)
    base = rep_min(args.sf01, "sf01", args.reps)
    big = rep_min(args.x10, "x10", args.reps)

    print(f"\n{'query':<22} {'sf0.1':>7} {'x10':>8} {'ratio':>7}  verdict")
    failed = []
    for q in SUBSET:
        ratio = big[q] / base[q]
        ok = ratio <= args.bound
        if not ok:
            failed.append(q)
        print(f"{q:<22} {base[q]:>6.2f}s {big[q]:>7.2f}s {ratio:>6.1f}x"
              f"  {'ok' if ok else 'OVER BOUND'}")
    if failed:
        raise SystemExit(
            f"scale guard FAILED (> {args.bound}x at 10x data): {failed}")
    print(f"\nscale guard ok: all ratios <= {args.bound}x at 10x data")


if __name__ == "__main__":
    main()
