#!/usr/bin/env python3
"""Compare a 1000x sweep JSONL against the r14 100x full-sweep raw map:
flag queries whose 1000x/100x wall ratio exceeds a threshold (10x data
should cost ~<=10x wall for a linear plan; box differences add noise,
so the default flag line is 15x) plus all timeouts/failures.

Rows that carry a per-row box canary (r16+ sweeps embed `canary`: the
frozen q6 canary's wall ratio vs its canonical seconds, measured right
after the row) also get a DE-DISTORTED ratio column (ratio / canary):
the r15 box drifted 1.26 -> 1.79 WITHIN one sweep, so per-session box
factors mis-adjudicate rows at both ends of the run.

Usage: python3 tools/sweep_compare.py <sweep.jsonl> [flag_ratio]
"""
import json
import sys


def main(path: str, flag: float = 15.0) -> None:
    base = json.load(open("bench_out/SWEEP_100x_FULL_r14_raw.json"))["queries"]
    rows = [json.loads(l) for l in open(path) if l.strip()]
    flagged, ok = [], 0
    for r in rows:
        q, sec, st = r["q"], r["sec"], r["status"]
        if st == "priced":  # expansion-bound pricing rows, not timings
            ok += 1
            continue
        canary = r.get("canary")
        b = base.get(q)
        ratio = sec / b if (b and b > 0) else None
        # de-distort by the row's own canary when present and sane
        adj = ratio / canary if (ratio and canary and canary > 0) else None
        if st != "ok":
            flagged.append((q, sec, b, ratio, adj, st))
        elif (adj if adj is not None else ratio) is not None \
                and (adj if adj is not None else ratio) > flag:
            flagged.append((q, sec, b, ratio, adj, "slow"))
        else:
            ok += 1
    print(f"{len(rows)} rows: {ok} ok, {len(flagged)} flagged "
          f"(ratio > {flag} or not-ok; canary-adjusted when available)")
    for q, sec, b, ratio, adj, st in sorted(
            flagged, key=lambda x: -((x[4] or x[3]) or 9999)):
        rs = f"{ratio:6.1f}x" if ratio else "   n/a "
        adjs = f"adj {adj:6.1f}x" if adj is not None else "          "
        bs = f"{b:8.1f}" if b else "     n/a"
        print(f"  {st:8s} {rs} {adjs}  1000x {sec:8.1f}s  100x {bs}s  {q}")


if __name__ == "__main__":
    main(sys.argv[1], float(sys.argv[2]) if len(sys.argv) > 2 else 15.0)
