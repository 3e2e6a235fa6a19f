"""Per-query isolation bench (guide §1.4): times individual declared
queries with the same .count() methodology as the frozen bench.py, plus
optional noop-sink timing and .explain("formatted") capture.

Usage:
    python bench_extra.py q1 q2 ...           # time queries
    python bench_extra.py --explain q1 ...    # also dump plans/r07/<q>_<tag>.txt
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py ...

This file is NOT bench.py — the frozen harness stays untouched; numbers
here are for optimization work and are cited in OPTIMIZATION_r07.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
TAG = os.environ.get("SPARK_GRAFT_PLAN_TAG", "before")


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")
    import __spark_entry__ as entrymod
    from py3dtiles_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_explain = "--explain" in sys.argv
    spark = get_spark("bench_extra", cpus=CPUS, shuffle_partitions=2 * CPUS)
    qs = {**entrymod.queries(), **entrymod.legacy_queries(),
          "simhash_neardup": entrymod.q_simhash_neardup_raw}
    names = args or list(qs)
    out: dict[str, object] = {}
    for name in names:
        fn = qs[name]
        if do_explain:
            import contextlib
            import io
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, SF_DIR).explain("formatted")
            os.makedirs("plans/r07", exist_ok=True)
            with open(f"plans/r07/{name}_{TAG}.txt", "w") as f:
                f.write(buf.getvalue())
        spark.sparkContext.setJobDescription(f"{name}: warmup")
        n = fn(spark, SF_DIR).count()
        ts = []
        for i in range(RUNS):
            spark.sparkContext.setJobDescription(f"{name}: run {i}")
            t0 = time.time()
            fn(spark, SF_DIR).count()
            ts.append(time.time() - t0)
        ts.sort()
        out[name] = {"median": round(ts[len(ts) // 2], 3),
                     "min": round(ts[0], 3), "max": round(ts[-1], 3),
                     "rows": n}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "all": out}))
    spark.stop()


if __name__ == "__main__":
    main()
