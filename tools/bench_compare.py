#!/usr/bin/env python3
"""Memo- and noise-aware comparison of two bench_full.json files.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [threshold_sec]

Comparing raw `total`s across rounds misreads two things the files
themselves disclose:

  1. SEMANTICS: r10 changed best-of-2 from memo-hit-min to memo-cold
     (context.semantics = "memo-cold-best-of-2"). A query that built
     memo state (memo_cold tag) reads much slower under the new
     discipline with zero plan change. This tool refuses to attribute
     deltas on memo-tagged queries across a semantics boundary, and
     says so per query.
  2. NOISE: both timed runs (`runs`) and per-query driver GC (`gc_sec`)
     are recorded. A delta where the two runs of the SAME sweep disagree
     by more than the cross-sweep delta is box noise, not a plan change;
     so is one with outsized gc_sec. The shared host runs ±20-40%.

Output: one line per query whose |delta| >= threshold (default 0.8 s),
classified as SEMANTICS / NOISE? / PLAN?, then a total line. PLAN? rows
are the only ones worth a human's time — and the classifier is
deliberately conservative: it can only say "not explained by what the
files disclose", never "definitely a regression". Verify a PLAN? row
with a fresh-JVM probe (SPARK_GRAFT_ONLY=<id> graft.Bench) before
believing it.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.8
    sem_old = old.get("context", {}).get("semantics", "memo-hit-best-of-2")
    sem_new = new.get("context", {}).get("semantics", "memo-hit-best-of-2")
    boundary = sem_old != sem_new
    if boundary:
        print(f"SEMANTICS BOUNDARY: {sem_old} -> {sem_new} — totals are "
              "not comparable on memo-tagged queries")
    memo_tagged = set(new.get("memo_cold", {})) | set(new.get("memo_pre", {})) \
        | set(old.get("memo_cold", {})) | set(old.get("memo_pre", {}))
    qs_old, qs_new = old["queries"], new["queries"]
    # A query present in only one file is a COVERAGE change, not a perf
    # delta: a new failure silently shrinks the new total (reading as an
    # improvement), a new query silently grows it. Surface both, plus any
    # change in the failed lists, BEFORE the per-query report — these are
    # breakage/coverage signals, never noise.
    breakage = False
    for q in sorted(set(qs_old) - set(qs_new)):
        tag = ("NEWLY FAILED" if q in set(new.get("failed", []))
               else "MISSING IN NEW")
        print(f"{tag:13s} {q:28s} {qs_old[q]:7.2f} -> absent "
              "(excluded from totals below)")
        breakage = True
    for q in sorted(set(qs_new) - set(qs_old)):
        print(f"{'NEW QUERY':13s} {q:28s}   absent -> {qs_new[q]:7.2f} "
              "(excluded from totals below)")
    fixed = set(old.get("failed", [])) - set(new.get("failed", []))
    if fixed:
        print(f"fixed since old sweep: {', '.join(sorted(fixed))}")
    rows = []
    common = sorted(set(qs_old) & set(qs_new))
    for q in common:
        d = qs_new[q] - qs_old[q]
        if abs(d) < thr:
            continue
        # noise evidence from BOTH files: an old-sweep outlier (wildly
        # disagreeing runs, huge GC) explains a delta just as well as a
        # new-sweep one — both carry runs/gc_sec, so use the max
        def spread_of(f):
            runs = f.get("runs", {}).get(q, [])
            return max(runs) - min(runs) if len(runs) >= 2 else 0.0
        spread = max(spread_of(new), spread_of(old))
        gc = max(new.get("gc_sec", {}).get(q, 0.0),
                 old.get("gc_sec", {}).get(q, 0.0))
        if boundary and q in memo_tagged:
            cls, why = "SEMANTICS", "memo-tagged across a semantics boundary"
        elif spread >= abs(d):
            cls, why = "NOISE?", f"run spread {spread:.2f} >= delta (either sweep)"
        elif gc >= abs(d) * 0.5:
            cls, why = "NOISE?", f"gc_sec {gc:.2f} dominates the delta (either sweep)"
        else:
            cls, why = "PLAN?", "not explained by memo tags, run spread, or GC"
        rows.append((cls, q, qs_old[q], qs_new[q], d, why))
    order = {"PLAN?": 0, "NOISE?": 1, "SEMANTICS": 2}
    for cls, q, a, b, d, why in sorted(rows, key=lambda r: (order[r[0]], -abs(r[4]))):
        print(f"{cls:9s} {q:28s} {a:7.2f} -> {b:7.2f} ({d:+.2f})  {why}")
    n_sem = sum(1 for r in rows if r[0] == "SEMANTICS")
    sem_delta = sum(r[4] for r in rows if r[0] == "SEMANTICS")
    # totals over the COMMON successful set only, so coverage changes
    # (new failures, new queries) can't masquerade as speed deltas; the
    # raw file totals are printed alongside for the record
    tot_old = sum(qs_old[q] for q in common)
    tot_new = sum(qs_new[q] for q in common)
    print(f"total (common {len(common)} queries) {tot_old:.1f} -> {tot_new:.1f} "
          f"({tot_new - tot_old:+.1f}); file totals {old['total']:.1f} -> "
          f"{new['total']:.1f}; "
          f"{n_sem} semantics-explained queries account for {sem_delta:+.1f}")
    return 1 if breakage or any(r[0] == "PLAN?" for r in rows) else 0


if __name__ == "__main__":
    sys.exit(main())
