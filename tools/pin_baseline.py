#!/usr/bin/env python3
"""Build/refresh BENCH_BASELINE.json — the committed per-query
clean-session steady pins that Bench's cross-run regression flag
(`regressed_vs_baseline`) compares against.

Usage: python3 tools/pin_baseline.py BENCH_FULL.json [note...]

Policy (VERDICT r12 item 1):
- only CLEAN steadies are pinnable: a query whose steady iteration is
  contention-flagged, tainted, or failed in the source run keeps its
  previous pin (or stays unpinned) — a contaminated number must never
  become the yardstick;
- re-pinning takes the per-query MIN of the old and new clean steady,
  so pins only ever tighten on unchanged code; after an intentional
  perf change, delete the query's entry (or the file) and re-pin.

The written shape is what Bench.loadBaseline reads:
  {"pinned_from": ..., "sf_dir": ..., "note": ..., "steady": {q: sec}}
"""
import sys, json, os


def main(full_path, note):
    doc = json.load(open(full_path))
    detail = doc.get("detail", {})
    fresh = {}
    skipped = []
    for name, d in sorted(detail.items()):
        steady = min((t for t in d["times"] if t >= 0), default=-1.0)
        if steady < 0 or d.get("tainted") or \
                d.get("steady_contended") in (True, "true"):
            skipped.append(name)
            continue
        fresh[name] = round(steady, 4)

    out = "BENCH_BASELINE.json"
    prev = {}
    if os.path.exists(out):
        prev = json.load(open(out)).get("steady", {})
    merged = dict(prev)
    for name, sec in fresh.items():
        merged[name] = min(prev.get(name, sec), sec)

    json.dump({
        "pinned_from": os.path.basename(full_path),
        "sf_dir": doc.get("sf_dir"),
        "host_cores": doc.get("env", {}).get("host_cores"),
        "note": " ".join(note) or
            "clean-session steady pins; see tools/pin_baseline.py policy",
        "steady": dict(sorted(merged.items())),
    }, open(out, "w"), indent=1)
    print(f"pinned {len(fresh)} fresh / {len(merged)} total; "
          f"skipped (unclean in source): {len(skipped)}")
    if skipped:
        print("  " + ", ".join(skipped[:20]) +
              (" ..." if len(skipped) > 20 else ""))


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2:])
