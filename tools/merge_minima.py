#!/usr/bin/env python3
"""Merge committed full bench records into the per-entry CROSS-RUN
MINIMA baseline the round gate compares against (r15 verdict #3: the
standing methodology when no clean host window exists in a round).

Rationale: external contention only ever inflates a measurement, so the
minimum median ever committed for an entry is the truest reference its
plan has; a baseline taken from a single degraded-window record blunts
the next round's regression trigger at exactly the entries with targets.
Each entry's minimum is paired with ITS OWN record's spread series (the
same pairing discipline as the bench's in-run level baseline), so the
VAR/recurrence gate never mixes one record's median with another's reps.

Usage: merge_minima.py [out.json] [record.json ...]
  With no record args, globs bench_full_r*.json in the repo root
  (committed round records + cross-validation runs). Writes the merged
  baseline to out.json (default target/minima_full.json) and prints a
  one-line summary.
"""
import glob
import json
import os
import sys


def main():
    args = sys.argv[1:]
    out_path = args[0] if args else "target/minima_full.json"
    paths = args[1:] if len(args) > 1 else sorted(
        glob.glob("bench_full_r*.json"),
        key=lambda p: int("".join(c for c in p if c.isdigit())))
    merged = {"metric": "total", "unit": "sec", "queries": {},
              "spread": {}, "source": {}, "merged_from": paths}
    for p in paths:
        try:
            d = json.load(open(p))
        except (json.JSONDecodeError, OSError) as e:
            print(f"[minima] skipping unreadable {p}: {e}", file=sys.stderr)
            continue
        for q, v in d.get("queries", {}).items():
            if q not in merged["queries"] or v < merged["queries"][q]:
                merged["queries"][q] = v
                merged["source"][q] = p
                if q in d.get("spread", {}):
                    merged["spread"][q] = d["spread"][q]
                else:
                    merged["spread"].pop(q, None)
    merged["value"] = sum(merged["queries"].values())
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    json.dump(merged, open(out_path, "w"), indent=1)
    print(f"[minima] {len(merged['queries'])} entries over {len(paths)} "
          f"record(s) -> {out_path} (total {merged['value']:.1f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
