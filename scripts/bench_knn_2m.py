"""One-off: the 2M-probe N->4N point for the bulk-kNN serving lane.

BENCH/BASELINE.md's r6 "Batch-size scaling" section reports measured
eff(2->8) of 0.53 at 100k and 0.77 at 1M probes, and an Amdahl fit
(~37 s fixed + ~654 core-s divisible at 1M) that PREDICTS >=0.8 at
~2M+ probes/batch. This script measures that prediction point: the
same steady-state protocol as scripts/bench_knn_batch.py (stored
index, fresh JVM per level, untimed full-batch warm pass, one timed
run) at local[2] and local[8] only — the N->4N ratio is what the
north rule grades; local[32] is skipped because 32 concurrent
~2M-group top-k agg tasks would need a larger heap than the fixed
16 g that keeps the comparison apples-to-apples with the 100k/1M
rows.

Usage: python scripts/bench_knn_2m.py [n_probes]
"""

from __future__ import annotations

import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from bench_knn_batch import ensure_fixtures, run_at  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    idx_path, warm_path, q_paths = ensure_fixtures([n])
    res = {}
    for cores in (2, 8):
        r = run_at(cores, idx_path, warm_path, q_paths[n], full_warm=True)
        r["probes_per_sec"] = round(n / r["sec"], 1)
        res[cores] = r
        print(json.dumps({"probes": n, **r}), flush=True)
    assert res[2]["rows"] == res[8]["rows"]
    eff = round((res[2]["sec"] / res[8]["sec"]) / 4, 3)
    print(json.dumps({"probes": n, "eff_2_to_8": eff,
                      "rows": res[2]["rows"]}), flush=True)


if __name__ == "__main__":
    main()
