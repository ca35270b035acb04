#!/usr/bin/env python3
"""Build the round's reconciled 1000x sweep summary artifact from the raw
JSONL — EVERY row classified, so the summary can never under-report its
own raw data (the r15 failure mode: summary said 5 flags, raw held 10).

Classes:
  ok          ratio (canary-adjusted when the row carries one) <= flag line
  linear_cap  timeout, but 10x the 100x cost already exceeds the per-query
              budget — a perfectly linear plan cannot finish; expected, and
              annotated with the linear floor it would need
  flagged     everything else (slow > flag line, unexplained timeout/fail)
  priced      expansion-bound dumps the sweep excluded but PRICED via
              their census twin (expected_output_rows at this fixture's
              duplication) - the exclusion's justification, in-artifact

Usage: python3 tools/sweep_summarize.py <raw.jsonl> <out.json> [flag_ratio]
         [baseline_json] [budget_sec]
"""
import json
import sys

DEFAULT_BASELINE = "bench_out/SWEEP_100x_FULL_r14_raw.json"


def main(raw_path: str, out_path: str, flag: float = 15.0,
         baseline_path: str = DEFAULT_BASELINE,
         budget: float = 600.0) -> None:
    base = json.load(open(baseline_path))["queries"]
    rows = [json.loads(l) for l in open(raw_path) if l.strip()]
    ok, linear_cap, flagged, priced = [], [], [], []
    for r in rows:
        q, sec, st = r["q"], r["sec"], r["status"]
        canary = r.get("canary")
        if st.startswith("price"):
            rec = {"q": q, "sec": round(sec, 1), "status": st,
                   "twin": r.get("twin"),
                   "expected_output_rows": r.get("expected_output_rows")}
            (priced if st == "priced" else flagged).append(rec)
            continue
        b = base.get(q)
        ratio = sec / b if (b and b > 0) else None
        adj = (ratio / canary
               if (ratio is not None and canary and canary > 0) else None)
        eff = adj if adj is not None else ratio
        rec = {"q": q, "sec": round(sec, 1), "sec_100x": b,
               "ratio": round(ratio, 1) if ratio is not None else None,
               "ratio_canary_adj": round(adj, 1) if adj is not None else None,
               "canary": canary, "status": st}
        if st == "timeout" and b and 10 * b >= budget * 0.9:
            rec["note"] = (f"linear floor 10x{b:.0f}s >= budget {budget:.0f}s"
                           " - expected timeout, not super-linearity")
            linear_cap.append(rec)
        elif st != "ok":
            flagged.append(rec)
        elif eff is not None and eff > flag:
            flagged.append(rec)
        else:
            ok.append(rec)
    out = {
        "purpose": ("Full-surface replica survival sweep, reconciled "
                    "from the raw JSONL - every "
                    "row classified; rows carry a per-row box canary "
                    "(frozen q6 vs canonical seconds) so ratios are "
                    "de-distorted per row, not per session."),
        "raw": raw_path,
        "baseline": baseline_path,
        "budget_sec": budget,
        "flag_line": flag,
        "counts": {"total": len(rows), "ok": len(ok),
                   "linear_cap_timeouts": len(linear_cap),
                   "flagged": len(flagged),
                   "expansion_bound_priced": len(priced)},
        "flagged": sorted(flagged, key=lambda x: -(x.get("ratio") or 9999)),
        "linear_cap_timeouts": linear_cap,
        "expansion_bound_priced": sorted(priced, key=lambda x: x["q"]),
        "worst_ok": sorted(ok, key=lambda x: -(x["ratio_canary_adj"]
                                               or x["ratio"] or 0))[:10],
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{len(rows)} rows -> {len(ok)} ok, {len(linear_cap)} "
          f"linear-cap timeouts, {len(flagged)} flagged; wrote {out_path}")
    for r in out["flagged"]:
        print("  FLAG", r)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 15.0,
         sys.argv[4] if len(sys.argv) > 4 else DEFAULT_BASELINE,
         float(sys.argv[5]) if len(sys.argv) > 5 else 600.0)
