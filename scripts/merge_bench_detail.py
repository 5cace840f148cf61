"""Merge two full-registry bench sweeps into the canonical
BENCH_DETAIL.json — the round-7 'min across two idle sweeps' protocol
made explicit: samples are concatenated per query (repeat-2 × 2 sweeps
= 4 samples), min recomputed, box stamp taken from the SECOND (later)
sweep.

Usage: python scripts/merge_bench_detail.py A.json B.json [OUT.json]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    a_path, b_path = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "BENCH_DETAIL.json"
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    if set(a["samples"]) != set(b["samples"]):
        raise SystemExit(
            f"sweep query sets differ: only-in-A="
            f"{sorted(set(a['samples']) - set(b['samples']))[:5]} "
            f"only-in-B={sorted(set(b['samples']) - set(a['samples']))[:5]}"
        )
    # Round-9 ADVICE: pooling sweeps from different scale factors would
    # silently stamp b's sf over mixed samples — refuse; a box mismatch
    # is legal (drift comparison) but worth a loud warning.
    if a["sf"] != b["sf"]:
        raise SystemExit(f"sweep scale factors differ: {a['sf']} vs {b['sf']}")
    def _box_id(d):
        box = d.get("box") or {}
        # the stamp includes the sweep date — identity is hw/kernel only
        return {k: box.get(k) for k in ("node", "release", "cpus")}

    if _box_id(a) != _box_id(b):
        print(
            f"WARNING: sweeps ran on different boxes "
            f"({_box_id(a)} vs {_box_id(b)}); min-pooling across "
            f"boxes mixes hardware states",
            file=sys.stderr,
        )
    samples = {
        q: a["samples"][q] + b["samples"][q] for q in a["samples"]
    }
    merged = {
        "sf": b["sf"],
        "repeat": a.get("repeat", 2) + b.get("repeat", 2),
        "box": b["box"],
        "note": "min across two idle sweeps x repeat-2 (4 samples/query)",
        "samples": samples,
        "min": {q: min(ts) for q, ts in samples.items()},
    }
    with open(out, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    total = sum(merged["min"].values())
    print(f"wrote {out}: {len(samples)} queries, total of mins {total:.1f}s")


if __name__ == "__main__":
    main()
