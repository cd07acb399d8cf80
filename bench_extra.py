"""Round-6 measurement harness (guide §1): isolated per-query timing with
the noop sink + ``.explain("formatted")`` capture.

``bench.py`` is frozen for measurement; this file exists so optimization
work can time individual queries (best-of-N wall + system-wide cpu-seconds
per query) and snapshot plans to ``plans/r06/`` without touching the
driver's harness. Usage:

    python bench_extra.py q1 q2 ...            # time the named queries
    python bench_extra.py --all                # every registered query
    LSS_PLAN_TAG=before python bench_extra.py --plans q1 ...  # also write
        plans/r06/<q>_<tag>.txt

Methodology matches bench.py: local[$SPARK_GRAFT_CPUS], warm-up noop pass,
spark.catalog.clearCache() before each rep, wall = best of $LSS_QUERY_REPS
(default 3), cpu = system-wide user+sys delta of the best-wall rep and the
min across reps (storm-robust).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from log_server_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _cpu():
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    return int(parts[0]) / 100.0, int(parts[2]) / 100.0


def main() -> None:
    import __spark_entry__ as entry_mod

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    qs = entry_mod.queries()
    qs["dedup_minhash_lsh_md5"] = qs["dedup_minhash_lsh"]
    # production xxhash64 LSH variant, benched under the headline name
    # (same override bench.py applies)
    from log_server_spark.operators.dedup_text import minhash_lsh_pairs

    def _prod_lsh(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return minhash_lsh_pairs(
            docs, "doc_id", "text",
            num_hashes=16, bands=8, shingle_n=3, threshold=0.5, base="xxhash64",
        )

    qs["dedup_minhash_lsh"] = _prod_lsh
    names = list(qs) if "--all" in flags else args
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    spark = get_spark(master=f"local[{CPUS}]", app_name="lss-bench-extra")
    spark.range(CPUS * 4).repartition(CPUS * 2).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    # same warm queries as bench.py so JIT state is comparable
    for warm in ("route_counts", "info_stats"):
        qs[warm](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    plan_tag = os.environ.get("LSS_PLAN_TAG", "")
    plan_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    reps = int(os.environ.get("LSS_QUERY_REPS", "3"))
    out: dict[str, dict] = {}
    for name in names:
        if "--plans" in flags and plan_tag:
            os.makedirs(plan_dir, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plan_dir, f"{name}_{plan_tag}.txt"), "w") as f:
                f.write(txt)
            spark.catalog.clearCache()
        best, best_cpu, cpu_min = float("inf"), 0.0, float("inf")
        for _ in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            u0, s0 = _cpu()
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            u1, s1 = _cpu()
            c = (u1 - u0) + (s1 - s0)
            cpu_min = min(cpu_min, c)
            if dt < best:
                best, best_cpu = dt, c
        out[name] = {
            "wall_s": round(best, 3),
            "cpu_s": round(best_cpu, 2),
            "cpu_min_s": round(cpu_min, 2),
        }
        print(f"{name}: {out[name]}", file=sys.stderr)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
