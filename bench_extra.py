"""Round-6 measurement harness (guide §1): time individual gated queries
with the noop sink, N reps each, same session/config as bench.py, and
optionally capture .explain("formatted") to plans/r06/.

This file is NOT the artifact of record — bench.py is frozen for driver
measurement. This exists so per-query before/after numbers and plans can
be gathered without paying a full 339-query pass.

Usage:
    python bench_extra.py q1 q2 ...            # time listed queries
    BENCH_EXTRA_REPS=3 python bench_extra.py q1
    BENCH_EXTRA_PLANS=before python bench_extra.py q1   # capture plan file
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry  # noqa: E402
from unsupervised_ner_spark.caching import cache_scope  # noqa: E402
from unsupervised_ner_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
    plan_tag = os.environ.get("BENCH_EXTRA_PLANS", "")
    names = sys.argv[1:]
    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=cpus)
    qs = entry.queries()
    out: dict[str, list[float]] = {}
    for name in names:
        if name not in qs:
            print(f"# unknown query {name}", file=sys.stderr)
            continue
        if plan_tag:
            plan_dir = REPO / "plans" / "r06"
            plan_dir.mkdir(parents=True, exist_ok=True)
            with cache_scope():
                df = qs[name](spark, sf_dir)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            (plan_dir / f"{name}_{plan_tag}.txt").write_text(txt)
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            with cache_scope():
                materialize(qs[name](spark, sf_dir))
            spark.catalog.clearCache()
            dt = round(time.time() - t0, 3)
            out.setdefault(name, []).append(dt)
            print(f"# {name} rep{r + 1}: {dt}s", file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
