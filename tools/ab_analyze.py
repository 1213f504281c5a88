"""Analyze an interleaved A/B directory from tools/ab_interleave.sh.

Prints per-run controls + steal evidence, then per-query min-of-runs
for each tree and the ratio table.  Usage:

    python tools/ab_analyze.py OUT_DIR [TREE_A_NAME TREE_B_NAME]

Tree names default to the two distinct basenames found in the dir.
Read the output through the meta log: a slot whose steal_ticks is an
outlier (or whose controls are far off the other slots') is
contaminated and its runs should be discounted.
"""

import glob
import json
import os
import re
import sys


def load(out_dir: str, tree: str) -> list[dict]:
    runs = []
    for f in sorted(glob.glob(os.path.join(out_dir, f"ab_{tree}_r*.json"))):
        try:
            runs.append(json.loads(open(f).read().strip()))
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"skip {f}: {e}")
    return runs


def mins(runs: list[dict]) -> dict[str, float]:
    out: dict[str, float] = {}
    for j in runs:
        for q, v in j.get("queries", {}).items():
            out[q] = min(out.get(q, float("inf")), v)
    return out


def main() -> None:
    out_dir = sys.argv[1]
    if len(sys.argv) >= 4:
        names = [sys.argv[2], sys.argv[3]]
    else:
        names = sorted(
            {
                re.match(r"ab_(.+)_r\d+\.json", os.path.basename(f)).group(1)
                for f in glob.glob(os.path.join(out_dir, "ab_*_r*.json"))
            }
        )
        assert len(names) == 2, f"expected 2 trees, found {names}"
    a, b = names
    ra, rb = load(out_dir, a), load(out_dir, b)
    print(f"runs: {a}={len(ra)} {b}={len(rb)}")
    for lbl, runs in ((a, ra), (b, rb)):
        for j in runs:
            c = j.get("controls", {})
            print(
                f"{lbl:>12} total {j['value']:7.2f} "
                f"ctl {c.get('start')} {c.get('end')}"
            )
    meta = os.path.join(out_dir, "ab_meta.log")
    if os.path.exists(meta):
        print("\nper-slot steal (from ab_meta.log):")
        for line in open(meta):
            if "steal_ticks" in line:
                print(" ", line.strip())
    ma, mb = mins(ra), mins(rb)
    common = [q for q in ma if q in mb]
    ta, tb = sum(ma[q] for q in common), sum(mb[q] for q in common)
    print(
        f"\nmin-sum over {len(common)} queries: "
        f"{a}={ta:.2f}s {b}={tb:.2f}s ratio(b/a)={tb / ta:.3f}"
    )
    rows = sorted((mb[q] / ma[q], q, ma[q], mb[q]) for q in common)
    for r, q, x, y in rows:
        print(f"  {r:5.2f}  {q:32s} {x:7.3f} -> {y:7.3f}")


if __name__ == "__main__":
    main()
