#!/usr/bin/env python3
"""Build/refresh BENCH_BASELINE.json — the committed per-query
clean-session steady pins that Bench's cross-run regression flag
(`regressed_vs_baseline`) compares against.

Usage: python3 tools/pin_baseline.py BENCH_FULL.json [-o PINFILE] [note...]

-o PINFILE writes/merges a different pin file (default
BENCH_BASELINE.json) — SF-scoped pin sets live in separate files
(e.g. BENCH_BASELINE_SF1.json), selected at bench time via
SPARK_GRAFT_BENCH_BASELINE; Bench itself refuses pins whose sf_dir
differs from the run's.

Policy (VERDICT r13 item 1 — replaces the r12 min-ratcheting policy,
which converged every pin to its best-ever reading so ordinary noise
tripped the 2x+0.2s gate: 7 false regressions in the r13 driver run):
- only CLEAN runs contribute: a query whose steady iteration is
  contention-flagged, tainted, or failed in the source run adds
  nothing to its history — a contaminated number must never become
  the yardstick;
- each clean run contributes the MEDIAN of its successful iterations
  (the run's typical cost; the min is codegen-cache/scheduler luck);
- the file keeps a bounded per-query history of run medians (newest
  last, capped at HISTORY_CAP); the pin is the median of that
  history, so one lucky or unlucky run moves the pin by at most one
  rank instead of ratcheting it permanently;
- Bench compares its run MIN against the pin, so the gate has slack
  on both sides: pin = typical-of-typicals, measured = best-of-run.
After an intentional perf change, delete the query's entry (or the
file) so stale history doesn't flag the new steady.

The written shape is what Bench.loadBaseline reads (it only consumes
`sf_dir` + `steady`; `history` is this tool's own state):
  {"pinned_from": ..., "sf_dir": ..., "note": ...,
   "steady": {q: sec}, "history": {q: [sec, ...]}}
"""
import sys, json, os
from statistics import median

HISTORY_CAP = 5


def main(full_path, note, out="BENCH_BASELINE.json"):
    doc = json.load(open(full_path))
    detail = doc.get("detail", {})
    fresh = {}
    skipped = []
    for name, d in sorted(detail.items()):
        ok = [t for t in d["times"] if t >= 0]
        if not ok or d.get("tainted") or \
                d.get("steady_contended") in (True, "true"):
            skipped.append(name)
            continue
        fresh[name] = round(median(ok), 4)

    hist = {}
    if os.path.exists(out):
        prev = json.load(open(out))
        hist = prev.get("history", {})
        if not hist:
            # migrate a pre-history pin file: its steady values seed
            # one-entry histories so old clean evidence isn't discarded
            hist = {q: [s] for q, s in prev.get("steady", {}).items()}
    for name, sec in fresh.items():
        hist[name] = (hist.get(name, []) + [sec])[-HISTORY_CAP:]
    steady = {q: round(median(h), 4) for q, h in hist.items()}

    json.dump({
        "pinned_from": os.path.basename(full_path),
        "sf_dir": doc.get("sf_dir"),
        "host_cores": doc.get("env", {}).get("host_cores"),
        "note": " ".join(note) or
            "median-of-clean-run-medians pins; see tools/pin_baseline.py",
        "steady": dict(sorted(steady.items())),
        "history": dict(sorted(hist.items())),
    }, open(out, "w"), indent=1)
    print(f"pinned {len(fresh)} fresh / {len(steady)} total; "
          f"skipped (unclean in source): {len(skipped)}")
    if skipped:
        print("  " + ", ".join(skipped[:20]) +
              (" ..." if len(skipped) > 20 else ""))


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    args = sys.argv[1:]
    outfile = "BENCH_BASELINE.json"
    if "-o" in args:
        i = args.index("-o")
        outfile = args[i + 1]
        args = args[:i] + args[i + 2:]
    main(args[0], args[1:], outfile)
