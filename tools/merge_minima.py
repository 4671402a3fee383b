#!/usr/bin/env python3
"""Merge committed full bench records into the per-entry CROSS-RUN
MINIMA baseline the round gate compares against (r15 verdict #3: the
standing methodology when no clean host window exists in a round).

Rationale: external contention only ever inflates a measurement, so the
minimum median ever committed for an entry is the truest reference its
plan has; a baseline taken from a single degraded-window record blunts
the next round's regression trigger at exactly the entries with targets.

r17 hardening (r16 ADVICE):
 - entries absent from the NEWEST record are DROPPED (age-out): an entry
   ever renamed or retired must not fail the FULL gate forever;
 - each entry's SPREAD comes from the newest record that carries it, so
   check_bench's "VAR RECURRED vs prev" keeps its intended meaning
   ("violated in the most recent record too"), not "violated in whatever
   historical record held the minimum";
 - output is written to a temp file and atomically renamed, so a crashed
   invocation can never leave a stale half-written baseline that passes
   close_round's [-s] check;
 - the glob sort key tolerates digit-less names (skipped with a note)
   and explicit record args (e.g. close_round's PREV_FULL anchor) are
   merged in even when they sit outside the glob.

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


def sort_key(p):
    digits = "".join(c for c in os.path.basename(p) if c.isdigit())
    if not digits:
        print(f"[minima] note: no round digits in {p} — sorted first",
              file=sys.stderr)
        return -1
    return int(digits)


def main():
    args = sys.argv[1:]
    out_path = args[0] if args else "target/minima_full.json"
    globbed = sorted(glob.glob("bench_full_r*.json"), key=sort_key)
    extra = [p for p in args[1:] if p not in globbed]
    paths = sorted(set(globbed + extra), key=sort_key)
    merged = {"metric": "total", "unit": "sec", "queries": {},
              "spread": {}, "source": {}, "merged_from": paths}
    newest_queries = None
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
            # spread tracks the NEWEST record carrying the entry (paths
            # are round-sorted, so the last writer wins) — the VAR
            # recurrence rule compares against the latest run's spread
            if q in d.get("spread", {}):
                merged["spread"][q] = d["spread"][q]
        if d.get("queries"):
            newest_queries = set(d["queries"])
    # age-out: an entry absent from the newest record is retired — keep
    # the gate about the CURRENT suite, not a permanent graveyard
    if newest_queries:
        gone = [q for q in merged["queries"] if q not in newest_queries]
        for q in gone:
            merged["queries"].pop(q)
            merged["spread"].pop(q, None)
            merged["source"].pop(q, None)
        if gone:
            print(f"[minima] aged out {len(gone)} entries absent from the "
                  f"newest record: {sorted(gone)[:10]}", file=sys.stderr)
    if not merged["queries"]:
        print("[minima] no readable records — refusing to write an empty "
              "baseline", file=sys.stderr)
        return 1
    merged["value"] = sum(merged["queries"].values())
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    tmp = out_path + ".tmp"
    json.dump(merged, open(tmp, "w"), indent=1)
    os.replace(tmp, out_path)
    print(f"[minima] {len(merged['queries'])} entries over {len(paths)} "
          f"record(s) -> {out_path} (total {merged['value']:.1f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
