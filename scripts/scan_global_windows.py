"""Scan EVERY gated query's physical plan for Window operators fed by an
Exchange SinglePartition (the data-sized global-window idiom VERDICT r05
item 3 flags as the 100x-scale liability). Prints one line per offender:

    <query>: window op (N) fed by SinglePartition exchange (M)

Used standalone during round 6 to enumerate offenders; the same detection
is wired into scripts/capture_plans.py as the blanket check with a
whitelist of bounded-input windows.
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry  # noqa: E402
from unsupervised_ner_spark.caching import cache_scope  # noqa: E402
from unsupervised_ner_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

_TREE_RE = re.compile(r"^[\s*+\-:|]*([A-Za-z][A-Za-z0-9 ]*?) \((\d+)\)\s*$")


def global_window_hits(plan: str) -> list[tuple[int, int]]:
    """Return (window_op_id, exchange_op_id) pairs where a Window's sort
    input chain reaches an Exchange whose Arguments are SinglePartition."""
    lines = plan.splitlines()
    # operator ids whose detail block says Arguments: SinglePartition
    sp_ids: set[int] = set()
    cur_id: int | None = None
    for ln in lines:
        m = re.match(r"^\((\d+)\) (\w+)", ln)
        if m:
            cur_id = int(m.group(1)) if m.group(2) == "Exchange" else None
        elif cur_id is not None and ln.startswith("Arguments: SinglePartition"):
            sp_ids.add(cur_id)
    hits: list[tuple[int, int]] = []
    # tree section: a Window's shuffle feed is within the next few tree
    # lines (Window -> Sort -> [ShuffleQueryStage/AQEShuffleRead] -> Exchange)
    ops = []
    for ln in lines:
        m = _TREE_RE.match(ln)
        if m:
            ops.append((m.group(1).strip(), int(m.group(2))))
    for i, (name, oid) in enumerate(ops):
        if name != "Window":
            continue
        for nxt_name, nxt_id in ops[i + 1:i + 5]:
            if nxt_name == "Exchange":
                if nxt_id in sp_ids:
                    hits.append((oid, nxt_id))
                break
            if nxt_name not in ("Sort", "AQEShuffleRead", "ShuffleQueryStage",
                                "InputAdapter", "WholeStageCodegen"):
                break
    return hits


def main() -> None:
    spark = get_spark("scan_global_windows", cores=4, shuffle_partitions=8)
    qs = entry.queries()
    only = set(sys.argv[1:])
    offenders = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            with cache_scope():
                df = fn(spark, SF)
                plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                    df._jdf.queryExecution(), "formatted"
                )
        except Exception as e:  # pragma: no cover - diagnostic path
            print(f"{name}: PLAN ERROR {e}", flush=True)
            continue
        hits = global_window_hits(plan)
        if hits:
            offenders.append(name)
            details = dict(
                re.findall(r"^\((\d+)\) (?:\w+).*?\nInput(?: \[\d+\])?: (.*)$",
                           plan, re.M)
            )
            for w, x in hits:
                print(f"{name}: window op ({w}) fed by SinglePartition "
                      f"exchange ({x}) carrying "
                      f"{details.get(str(x), '?')[:160]}", flush=True)
    print(f"\n== {len(offenders)} offender(s): {sorted(offenders)}")
    spark.stop()


if __name__ == "__main__":
    main()
