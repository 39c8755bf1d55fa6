#!/usr/bin/env python3
"""Compare two bench_out.json artifacts: totals, per-query ratios on the
shared rows, movers beyond a threshold, and streaming pb_n/marginals.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [ratio_threshold]
"""
import json
import statistics
import sys


def main() -> int:
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    oq, nq = old["queries"], new["queries"]
    shared = sorted(k for k in oq if k in nq and oq[k] and nq[k])
    ratios = {k: nq[k] / oq[k] for k in shared}
    # filtered adjudication runs can share zero rows with a full run —
    # report the disjointness instead of dying on median([])
    med = statistics.median(ratios.values()) if ratios else float("nan")
    print(f"old total {old['value']:.1f}s ({len(oq)} rows)  "
          f"new total {new['value']:.1f}s ({len(nq)} rows)")
    print(f"shared rows {len(shared)}  median ratio {med:.3f}")
    print(f"new-only rows: {sorted(set(nq) - set(oq))}")
    nulls = [k for k, v in nq.items() if v is None]
    print(f"new nulls: {nulls}")
    movers = sorted((r, k) for k, r in ratios.items() if r > thr or r < 1 / thr)
    for r, k in movers:
        print(f"  mover {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s  ({r:.2f}x)")
    ph = new.get("phases", {})
    stream = {k: v for k, v in ph.items() if "pb_n" in v}
    bad = {k: v["pb_n"] for k, v in stream.items() if v["pb_n"] < 5}
    print(f"stream rows with pb_n: {len(stream)}; pb_n<5: {bad}")
    if stream:
        tot_marg = sum(v["per_batch_s"] for v in stream.values())
        tot_drain = sum(v.get("drain", 0.0) for v in stream.values())
        print(f"sum per_batch_s {tot_marg:.2f}s  sum drain {tot_drain:.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
