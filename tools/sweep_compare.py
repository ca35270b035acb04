#!/usr/bin/env python3
"""Compare a 1000x sweep JSONL against the r14 100x full-sweep raw map:
flag queries whose 1000x/100x wall ratio exceeds a threshold (10x data
should cost ~<=10x wall for a linear plan; box differences add noise,
so the default flag line is 15x) plus all timeouts/failures.

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
        b = base.get(q)
        ratio = sec / b if (b and b > 0) else None
        if st != "ok":
            flagged.append((q, sec, b, ratio, st))
        elif ratio is not None and ratio > flag:
            flagged.append((q, sec, b, ratio, "slow"))
        else:
            ok += 1
    print(f"{len(rows)} rows: {ok} ok, {len(flagged)} flagged "
          f"(ratio > {flag} or not-ok)")
    for q, sec, b, ratio, st in sorted(
            flagged, key=lambda x: -(x[3] or 9999)):
        rs = f"{ratio:6.1f}x" if ratio else "   n/a "
        bs = f"{b:8.1f}" if b else "     n/a"
        print(f"  {st:8s} {rs}  1000x {sec:8.1f}s  100x {bs}s  {q}")


if __name__ == "__main__":
    main(sys.argv[1], float(sys.argv[2]) if len(sys.argv) > 2 else 15.0)
