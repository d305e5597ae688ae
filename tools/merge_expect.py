"""Merge bench run details into BENCH_EXPECT.json (best-observed refs).

Policy (VERDICT r14 #5): min-merge per line, EXCEPT that a sub-0.5 s
candidate which undercuts the next-smallest observation by more than 2x
is treated as a deep-dip noise minimum and the next-smallest observation
is used instead — a 0.29 s one-off against a 1.4 s typical reading
otherwise arms a 4.8x "weak" flag (and outlier retries) on every normal
run. Genuinely fast lines (e.g. 0.07 s topk) keep their minima: their
observations cluster, so the 2x guard never fires.

Usage:
    python tools/merge_expect.py DETAIL.json [DETAIL2.json ...]
reads each file's "queries" map (a bench per-line timings dict), merges
into BENCH_EXPECT.json in place (respecting its _sf stamp), prints the
changed refs.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXPECT = os.path.join(REPO, "BENCH_EXPECT.json")

NOISE_FLOOR_SEC = 0.5
NOISE_RATIO = 2.0


def merged_ref(candidates: list[float]) -> float:
    """Min of candidates, with singleton deep-dip minima below the
    noise floor promoted to the next-smallest observation."""
    cs = sorted(candidates)
    if (
        len(cs) >= 2
        and cs[0] < NOISE_FLOOR_SEC
        and cs[0] * NOISE_RATIO < cs[1]
    ):
        return cs[1]
    return cs[0]


def main() -> None:
    expect = json.load(open(EXPECT))
    sf = expect.get("_sf")
    per_line: dict[str, list[float]] = {}
    for path in sys.argv[1:]:
        d = json.load(open(path))
        if sf is not None and d.get("sf") not in (None, sf):
            raise SystemExit(f"{path}: sf {d.get('sf')} != expect _sf {sf}")
        for k, v in d["queries"].items():
            per_line.setdefault(k, []).append(float(v))
    changed = []
    for k, cands in per_line.items():
        old = expect.get(k)
        if old is not None:
            cands = cands + [float(old)]
        new = round(merged_ref(cands), 3)
        if old is None or new != old:
            expect[k] = new
            changed.append((k, old, new))
    with open(EXPECT, "w") as f:
        json.dump(dict(sorted(expect.items(), key=lambda kv: kv[0])), f,
                  indent=1)
    for k, old, new in sorted(changed):
        print(f"{k}: {old} -> {new}")
    print(f"{len(changed)} refs changed")


if __name__ == "__main__":
    main()
