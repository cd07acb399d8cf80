"""A/B the parse stage alone (pages -> parsed -> noop sink) fast vs slow.

Usage: python scripts/ab_parse.py <pages_dir> <master> [reps]
Prints one line per run with wall + cpu(user/sys) deltas from /proc/stat.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stat():
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    return int(parts[0]) / 100.0, int(parts[2]) / 100.0


def main():
    pages_dir, master = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    from log_server_spark.functions.parse import parse_pages
    from log_server_spark.session import get_spark

    spark = get_spark(master=master, app_name="ab-parse")
    pages = spark.read.parquet(os.path.join(pages_dir, "pages"))
    n = pages.count()
    # warm the python worker pool + JIT both paths once
    for fast in (False, True):
        parse_pages(pages.limit(2000), fast=fast).write.format("noop").mode(
            "overwrite"
        ).save()
    best = {}
    for r in range(reps):
        for fast in (False, True):
            u0, s0 = _stat()
            t0 = time.time()
            parse_pages(pages, fast=fast).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            u1, s1 = _stat()
            print(
                f"rep{r} fast={int(fast)} wall={dt:.2f}s docs/s={n / dt:.0f} "
                f"cpu_user={u1 - u0:.1f} cpu_sys={s1 - s0:.1f}",
                flush=True,
            )
            best[fast] = min(best.get(fast, 9e9), dt)
    print(f"best slow={best[False]:.2f} fast={best[True]:.2f} speedup={best[False] / best[True]:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
