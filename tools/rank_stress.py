#!/usr/bin/env python3
"""Near-unique value-domain stress for the rankedRle family (SCALE.md
round-12 item; the lp1 hub-stress precedent applied to the global-rank
operators).

The standard 10x synthesis (tools/scale_sweep.py) offsets KEYS but
replicates the price/value distributions verbatim, so the RLE value
domain of lorenz1/conf1/rho1/mw1/trim1 barely grows and the 10x guard
under-stresses the two-phase rank: every distinct value still collapses
to a fat run. At real scale per-customer cent totals are NEAR-UNIQUE -
RLE gives no compression and each range bucket must hold its slice of a
domain as large as the row count. rankedRle's round-12 stats-adaptive
bucket width exists for exactly that regime; this tool measures it.

Method: jitter every ranked value column by a key-derived deterministic
amount (+ (key % 99991) / 100, exact cents) in BOTH a 1x and a 10x copy
of the fixtures, then time the five rankedRle consumers at both scales.
Because the SAME transform is applied at both scales, the ratio
isolates data growth on a no-compression domain. Validation data only -
correctness oracles always run against the driver fixtures.

Usage: python3 tools/rank_stress.py [--bound 9] [--reps 2]
"""
import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import scale_sweep  # noqa: E402  (synthesize + rep_min reused verbatim)

SUBSET = ["lorenz1_deciles", "trim1_robust_means", "conf1_interval",
          "rho1_spearman", "mw1_rank_test"]

# table -> (value column, jitter key expression)
JITTER = {
    "orders": ("o_totalprice", "o_orderkey"),
    "lineitem": ("l_extendedprice", "l_orderkey * 8 + l_linenumber"),
    "events": ("value", "event_id"),
}


def jitter(src: str, dst: str, force: bool) -> None:
    import duckdb
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for name in scale_sweep.COPY_1X + sorted(scale_sweep.KEYS):
        src_file = f"{src}/{name}.parquet"
        out = os.path.join(dst, f"{name}.parquet")
        if (os.path.exists(out) and not force
                and os.path.getmtime(out) > os.path.getmtime(src_file)):
            continue
        if name not in JITTER:
            shutil.copyfile(src_file, out)
            print(f"[jitter] {name}: copied verbatim")
            continue
        valcol, keyexpr = JITTER[name]
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src_file}'").fetchall()]
        sel = ", ".join(
            f"{c} + (({keyexpr}) % 99991) / 100.0 AS {c}" if c == valcol
            else c for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{src_file}') TO '{out}' "
            "(FORMAT PARQUET)")
        nd, n = con.execute(
            f"SELECT count(DISTINCT {valcol}), count(*) FROM '{out}'"
        ).fetchone()
        print(f"[jitter] {name}.{valcol}: {nd}/{n} distinct after jitter")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bound", type=float, default=9.0)
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument("--x10", default="/tmp/sfx10_sweep")
    ap.add_argument("--rank1", default="/tmp/sfrank1")
    ap.add_argument("--rank10", default="/tmp/sfrank10")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    scale_sweep.synthesize(args.sf01, args.x10, args.force)
    jitter(args.sf01, args.rank1, args.force)
    jitter(args.x10, args.rank10, args.force)

    base = scale_sweep.rep_min(args.rank1, "rank1", args.reps, SUBSET)
    big = scale_sweep.rep_min(args.rank10, "rank10", args.reps, SUBSET)

    print(f"\n{'query':<22} {'1x':>7} {'10x':>8} {'ratio':>7}  verdict")
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
            f"rank stress FAILED (> {args.bound}x at 10x data): {failed}")
    print(f"\nrank stress ok: all ratios <= {args.bound}x on a "
          "near-unique value domain")


if __name__ == "__main__":
    main()
