"""Per-line bench comparison: BENCH_DETAIL.json vs BENCH_EXPECT.json.

The round-12 bench methodology (BASELINE.md) reads cross-round deltas
per line against the best-observed references, never from single-run
totals — the sandbox VM's ambient speed drifts 1.3-2x within a day.
This prints the lines whose latest recorded value most exceeds its
reference (the candidates for either a real regression or a degraded
session), plus the aggregate ratio.

Usage: python tools/bench_compare.py [detail.json] [expect.json]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    detail_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_DETAIL.json"
    )
    expect_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "BENCH_EXPECT.json"
    )
    detail = json.load(open(detail_path))
    expect = json.load(open(expect_path))
    rows = []
    for name, got in detail["queries"].items():
        if name.startswith("dedup_family_stage_"):
            continue
        ref = expect.get(name)
        if ref is None or ref <= 0:
            continue
        rows.append((got / ref, got - ref, name, got, ref))
    rows.sort(reverse=True)
    got_total = sum(r[3] for r in rows)
    ref_total = sum(r[4] for r in rows)
    print(
        f"total {got_total:.1f}s vs best-observed {ref_total:.1f}s "
        f"(x{got_total / ref_total:.2f}) over {len(rows)} compared lines"
    )
    over = [r for r in rows if r[0] > 1.5 and r[1] > 0.5]
    print(f"{len(over)} lines >1.5x (and >0.5s over) their reference:")
    for ratio, delta, name, got, ref in over[:25]:
        print(f"  x{ratio:4.1f}  +{delta:6.2f}s  {name}  ({got} vs {ref})")
    new = sorted(set(detail["queries"]) - set(expect) - {
        k for k in detail["queries"] if k.startswith("dedup_family_stage_")
    })
    if new:
        print("lines without a reference (new this round):", new)


if __name__ == "__main__":
    main()
