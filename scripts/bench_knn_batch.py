"""Bulk-kNN-serving batch-size scaling: the r5 Amdahl defense of the
100k-probe lane's 0.60 N->4N efficiency claimed the ~17 s
parallelism-independent share (index load, planning, coarsest cascade
stage) is per-BATCH, so efficiency RISES with batch size — at ~1M
probes the parallel share should put N->4N at >=0.8 (VERDICT r5 #3
asks for the measurement).

Method mirrors scripts/bench_scaling.py: the SAME serving job (stored
index, 1M-scene corpus) at local[2] / local[8] / local[32], fresh JVM
per level, fixed shuffle partitions (64), one untimed small-batch warm
pass (Python-worker + JIT startup), then ONE timed full-batch run per
level (a 1M-probe local[2] run is several minutes; best-of-N would
triple a measurement whose run-to-run spread is far below the 4x
signal). Probe counts 100k (the bench lane) and 1M (the Amdahl
prediction point).

Default protocol is COLD (the timed run includes the shuffle plan's
first-exec cost — codegen, Arrow worker spin-up — because the 2k warm
pass compiles only the broadcast plan); pass ``--steady`` to add one
untimed FULL-batch pass first, measuring the marginal batch cost of a
long-lived serving session (the protocol of BENCH/BASELINE.md's
"best of 2 after warm-up" tables; the first-exec time is reported
alongside as first_exec_sec).

Prints one JSON line per (probes, cores) plus a summary; paste the
table into BENCH/BASELINE.md "Bulk kNN serving" (this script does NOT
rewrite the file — bench_scaling.py owns the top sections).

Usage: python scripts/bench_knn_batch.py [probe_counts ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".bench_cache")
N_SCENES = int(os.environ.get("BENCH_SCENES", "1000000"))

RUN_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from mosaic_engine import job, ops

cores = {cores}
spark = job.make_session(cores=cores, shuffle_partitions=64, app="knnbatch")
spark.sparkContext.setLogLevel("ERROR")
idx = ops.knn_index_load(spark, {idx_path!r})
warm = spark.read.parquet({warm_path!r})
ops.knn_join(None, warm, index=idx).count()  # untimed worker warm-up
q = spark.read.parquet({q_path!r})
cold = None
if {full_warm}:
    # steady-state protocol (matches BENCH/BASELINE.md "best of 2
    # after warm-up"): one untimed FULL-batch pass first, so the timed
    # run measures the marginal batch cost of a long-running server —
    # the 2k warm above exercises the <=50k broadcast plan, NOT the
    # shuffle plan a bulk batch compiles, so without this the timed
    # run carries ~20 s of parallelism-independent first-exec cost
    # (codegen + Arrow worker spin-up + shuffle-machinery init) that
    # masquerades as serial fraction in the N->4N ratio.
    t0 = time.time()
    ops.knn_join(None, q, index=idx).count()
    cold = round(time.time() - t0, 2)
t0 = time.time()
n = ops.knn_join(None, q, index=idx).count()
dt = time.time() - t0
print(json.dumps({{"cores": cores, "sec": round(dt, 2), "rows": int(n),
                   "first_exec_sec": cold}}))
spark.stop()
"""


def ensure_fixtures(probe_counts: list[int]) -> tuple[str, str, dict]:
    """Build/save the served index and probe batches once (local[32])."""
    sys.path.insert(0, REPO)
    from mosaic_engine import datagen, job, ops

    os.makedirs(CACHE, exist_ok=True)
    scenes_path = os.path.join(CACHE, f"scenes_bulk_{N_SCENES}.parquet")
    idx_path = os.path.join(CACHE, f"knn_index_v5_{N_SCENES}")
    warm_path = os.path.join(CACHE, "knn_queries_warm2k.parquet")
    q_paths = {}
    need_idx = not os.path.exists(os.path.join(idx_path, "meta", "_SUCCESS"))
    if not os.path.exists(warm_path):
        datagen.write_parquet(
            datagen.gen_knn_queries(n=2000, seed=45), warm_path
        )
    for n in probe_counts:
        p = os.path.join(CACHE, f"knn_queries_{n}.parquet")
        if not os.path.exists(p):
            datagen.write_parquet(datagen.gen_knn_queries(n=n, seed=43), p)
        q_paths[n] = p
    if need_idx:
        spark = job.make_session(cores=32, app="knnbatch-fixtures")
        spark.sparkContext.setLogLevel("ERROR")
        if not os.path.exists(scenes_path):
            datagen.write_parquet(
                datagen.gen_scenes_bulk(N_SCENES, paths=50, rows=20, seed=42),
                scenes_path,
            )
        idx = ops.knn_index(spark.read.parquet(scenes_path), k_hint=3)
        ops.knn_index_save(idx, idx_path)
        spark.stop()
    return idx_path, warm_path, q_paths


def run_at(
    cores: int, idx_path: str, warm_path: str, q_path: str,
    full_warm: bool = False,
) -> dict:
    code = RUN_SNIPPET.format(
        repo=REPO, cores=cores, idx_path=idx_path,
        warm_path=warm_path, q_path=q_path, full_warm=full_warm,
    )
    env = {**os.environ}
    # NOT 48g (bench_scaling.py's choice for its multi-GB cached
    # payload input): an oversized local-mode heap measurably WRECKS
    # this Arrow-heavy lane — A/B on the same 100k-probe job at
    # local[32]: 48g heap = 117 s, 8g heap = 27 s (4.3×). The lane's
    # JVM working set is tiny (30 MB index + shuffle buffers); the
    # giant heap just turns every young-gen GC into a long pause.
    # 16g (not 8g): the 1M-probe final top-k agg OOMs an 8g heap at
    # local[32] (32 concurrent agg tasks × ~1M-group hash maps), while
    # 16g keeps the 100k lane within noise of 8g (31.5 s vs 27 s).
    # One fixed heap for EVERY (probes, cores) config keeps the
    # N→4N comparison apples-to-apples.
    env.setdefault("SPARK_DRIVER_MEM", "16g")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=5400, cwd=REPO, env=env,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(lines[-1])


def main():
    args = sys.argv[1:]
    full_warm = "--steady" in args
    probe_counts = [int(a) for a in args if not a.startswith("-")] or [
        100_000,
        1_000_000,
    ]
    idx_path, warm_path, q_paths = ensure_fixtures(probe_counts)
    summary = {}
    for n in probe_counts:
        res = {}
        for cores in (2, 8, 32):
            r = run_at(cores, idx_path, warm_path, q_paths[n], full_warm)
            r["probes_per_sec"] = round(n / r["sec"], 1)
            res[cores] = r
            print(json.dumps({"probes": n, **r}), flush=True)
        assert len({r["rows"] for r in res.values()}) == 1
        eff = round((res[2]["sec"] / res[8]["sec"]) / 4, 3)
        summary[n] = {
            **{f"sec_local{c}": res[c]["sec"] for c in res},
            "eff_2_to_8": eff,
            "eff_8_to_32": round((res[8]["sec"] / res[32]["sec"]) / 4, 3),
        }
        print(json.dumps({"probes": n, **summary[n]}), flush=True)
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
