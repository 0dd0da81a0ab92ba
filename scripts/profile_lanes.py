"""Per-lane profiling harness for the optimization round (guide §1).

NOT the driver bench — bench.py stays frozen. This script isolates each
bench lane with the noop sink (so we time computation, not .count()'s
column pruning quirks aside — we keep .count() where bench.py counts,
and noop where we want every column computed), labels jobs, and dumps
`.explain("formatted")` per lane into plans/r07/<query>_<tag>.txt.

Usage: python scripts/profile_lanes.py <tag> [lane ...]
  tag: suffix for plan files (before/after)
  lanes: subset to run (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_SCENES = int(os.environ.get("BENCH_SCENES", "1000000"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".bench_cache")
PLANS = os.path.join(REPO, "plans", "r07")


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "probe"
    only = set(sys.argv[2:])
    os.makedirs(PLANS, exist_ok=True)

    import __spark_entry__ as entrymod
    from mosaic_engine import annops, datagen, mosaic as mz, ops
    from mosaic_engine.job import make_session
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    spark = make_session(
        cores=CPUS, shuffle_partitions=max(int(CPUS) * 2, 16), app="profile"
    )
    spark.sparkContext.setLogLevel("ERROR")

    @pandas_udf("long")
    def _warm(x):
        return x

    spark.range(100_000).select(F.sum(_warm("id"))).collect()

    times: dict[str, list[float]] = {}

    def run(name, dffn, action="noop", repeats=3, plan=True):
        if only and name not in only:
            return
        sc = spark.sparkContext
        if plan:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                dffn().explain("formatted")
            with open(os.path.join(PLANS, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        samples = []
        for i in range(repeats):
            sc.setJobDescription(f"{name} run{i}")
            t0 = time.time()
            df = dffn()
            if action == "noop":
                df.write.format("noop").mode("overwrite").save()
            elif action == "count":
                df.count()
            elif action == "collect":
                df.collect()
            samples.append(round(time.time() - t0, 3))
            sc.setJobDescription(None)
        times[name] = samples
        print(f"{name}: {samples}", flush=True)

    # ---- flagship synthetic lanes (mirrors bench.py setup) ----
    scenes_path = os.path.join(CACHE, f"scenes_bulk_{N_SCENES}.parquet")
    if not os.path.exists(scenes_path):
        t = datagen.gen_scenes_bulk(N_SCENES, paths=50, rows=20, seed=42)
        datagen.write_parquet(t, scenes_path)
    scenes = spark.read.parquet(scenes_path).repartition(int(CPUS) * 4).cache()
    scenes.count()
    cfg = ops.MosaicConfig(quadkey_zoom=8, optimized_selection=False)

    run(
        "mosaic_build_synthetic",
        lambda: mz.quadkey_assignments(scenes, cfg).agg(
            {"n_assets": "sum", "quadkey": "count"}
        ),
        action="collect",
    )

    qpath = os.path.join(CACHE, "knn_queries.parquet")
    if not os.path.exists(qpath):
        datagen.write_parquet(datagen.gen_knn_queries(n=500, seed=42), qpath)
    knn_queries = spark.read.parquet(qpath)
    run(
        "knn_banded_synthetic",
        lambda: ops.knn_join(scenes, knn_queries),
        action="count",
    )
    knn_idx = ops.knn_index(scenes, k_hint=3)
    run(
        "knn_banded_served",
        lambda: ops.knn_join(None, knn_queries, index=knn_idx),
        action="count",
    )
    idx_path = os.path.join(CACHE, f"knn_index_v5_{N_SCENES}")
    if not os.path.exists(os.path.join(idx_path, "meta", "_SUCCESS")):
        ops.knn_index_save(knn_idx, idx_path)
    run(
        "knn_banded_cold_index",
        lambda: ops.knn_join(
            None, knn_queries, index=ops.knn_index_load(spark, idx_path)
        ),
        action="count",
    )
    qpath_bulk = os.path.join(CACHE, "knn_queries_100k.parquet")
    if not os.path.exists(qpath_bulk):
        datagen.write_parquet(
            datagen.gen_knn_queries(n=100_000, seed=43), qpath_bulk
        )
    knn_queries_bulk = spark.read.parquet(qpath_bulk)
    run(
        "knn_served_100k_probes",
        lambda: ops.knn_join(None, knn_queries_bulk, index=knn_idx),
        action="count",
    )

    # ---- entry-table lanes (same set bench.py times) ----
    qs = entrymod.queries()
    for name in (
        "geo_tile_assign",
        "geo_quadkey_agg",
        "geo_knn_brute",
        "dedup_minhash_lsh_pairs",
        "dedup_simhash",
        "dedup_simhash_pairs",
        "dedup_clusters",
        "text_fingerprint",
        "text_token_count_bpe",
        "ann_cosine_topk",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "tpch_q1",
        "tpch_q3",
    ):
        run(name, lambda n=name: qs[n](spark, SF_DIR), action="count")

    ivf_path = os.path.join(
        CACHE, f"ivf_index_{SF_DIR.rstrip('/').split('sf')[-1]}"
    )
    if not os.path.exists(os.path.join(ivf_path, "meta", "_SUCCESS")):
        annops.ivf_index_save(annops.ivf_index(
            spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        ), ivf_path)
    run(
        "ann_ivf_served",
        lambda: annops.ivf_topk(
            None, index=annops.ivf_index_load(spark, ivf_path)
        ),
        action="count",
    )

    out = {
        "tag": tag,
        "sf": SF_DIR,
        "cores": int(CPUS),
        "samples": times,
        "min": {k: min(v) for k, v in times.items()},
    }
    fname = os.path.join(REPO, "plans", "r07", f"profile_{tag}.json")
    with open(fname, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["min"]))
    spark.stop()


if __name__ == "__main__":
    main()
