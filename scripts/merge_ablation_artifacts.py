"""Merge partial completion-ablation artifacts (resumed sweeps).

scripts/completion_refinement_ablation.py supports --seed-base to resume a
timed-out sweep; this merges the per_seed lists of the partial artifacts
(seed order = artifact order) and recomputes means and the paired
per-seed deltas (ddof=1 sample std, n reported).

Usage: python scripts/merge_ablation_artifacts.py out.json part1.json part2.json ...
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from completion_refinement_ablation import paired_deltas  # noqa: E402


def main():
    out_path, *parts = sys.argv[1:]
    arts = [json.load(open(p)) for p in parts]
    base = arts[0]
    per_seed = {arm: [] for arm in base["per_seed"]}
    for art in arts:
        for arm, rs in art["per_seed"].items():
            per_seed[arm].extend(rs)
    n_seeds = len(per_seed["no_cspn"])
    assert all(len(rs) == n_seeds for rs in per_seed.values()), {
        a: len(r) for a, r in per_seed.items()
    }
    means = {
        arm: {k: round(sum(r[k] for r in rs) / len(rs), 4) for k in rs[0]}
        for arm, rs in per_seed.items()
    }
    paired = paired_deltas(per_seed)
    rec = dict(base)
    rec["config"] = dict(base["config"], seeds=n_seeds)
    rec["paired_improvement_vs_no_cspn"] = paired
    rec["means"] = means
    rec["per_seed"] = per_seed
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"seeds": n_seeds, "means": means, "paired": paired}))


if __name__ == "__main__":
    main()
