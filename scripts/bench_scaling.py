"""Two-parallelism-level scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors; sandbox stand-in per the driver
instruction: same job, same input, at N and 4N local cores — default
local[2] vs local[8], the largest 4x step the hypervisor physically honors;
see calibrate()).

Protocol (VERDICT r01 item 6): >= 5 INTERLEAVED N/4N-core pairs, each in a
fresh subprocess (a JVM can't change master in-process); the HEADLINE is
the MEDIAN of the per-pair efficiencies with min/max dispersion — never a
best pair. Additionally one COLD pair (no warmup, uncached input, synth
included in the timed window) reproduces what the driver's bench measures,
so the warm-vs-cold gap is published instead of explained away.

Writes the measured sections of BENCH.md in place and appends every pair to
the run log.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from unsupervised_ner_spark.session import get_spark
from unsupervised_ner_spark.pipeline.runner import run_pipeline
from unsupervised_ner_spark.pipeline.synth import synth_pages

cores = int(sys.argv[1]); n_pages = int(sys.argv[2]); mode = sys.argv[3]
spark = get_spark(f"scal{{cores}}", cores=cores, shuffle_partitions=cores)
if mode == "warm":
    pages = synth_pages(spark, n_pages).repartition(cores * 2).cache()
    pages.count()  # materialize input outside the timed window
    # warmup: run the pipeline over a small slice so every worker process
    # has loaded its dimension bundle / JIT'd codegen — steady-state
    # throughput is what a 10^12-row job sees (cold start amortizes to zero)
    warm = synth_pages(spark, cores * 64).repartition(cores * 2)
    run_pipeline(warm, lang_filter="en")["triples"].write.format("noop").mode("overwrite").save()
    t0 = time.time()
    stages = run_pipeline(pages, lang_filter="en")
    stages["triples"].write.format("noop").mode("overwrite").save()
else:  # cold: everything in the timed window, like the driver's bench
    t0 = time.time()
    pages = synth_pages(spark, n_pages).repartition(cores * 2)
    stages = run_pipeline(pages, lang_filter="en")
    stages["triples"].write.format("noop").mode("overwrite").save()
dt = time.time() - t0
print(json.dumps({{"cores": cores, "pages": n_pages, "mode": mode,
                   "secs": round(dt, 2),
                   "docs_per_sec": round(n_pages / dt, 1)}}))
spark.stop()
"""


def run_level(cores: int, n_pages: int, mode: str = "warm") -> dict:
    script = CHILD.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(n_pages), mode],
        capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def _fmt(xs):
    return f"{statistics.median(xs):.2f} (min {min(xs):.2f}, max {max(xs):.2f})"


def calibrate(lo_workers: int, hi_workers: int) -> dict:
    """Raw-CPU ceiling: pure busy-loops, zero coordination. The measured
    ratio bounds ANY job's achievable scaling on this box (hypervisor
    oversubscription: nproc says 32, the hypervisor delivers far less)."""
    import multiprocessing as mp

    def _wall(workers: int) -> float:
        t0 = time.time()
        with mp.Pool(workers) as pool:
            pool.map(_burn, [40_000_000] * workers)
        return time.time() - t0

    # interleave 3 rounds and take medians — a single short wall per level
    # just samples whichever hypervisor phase it lands in
    lo_walls, hi_walls = [], []
    for _ in range(3):
        lo_walls.append(_wall(lo_workers))
        hi_walls.append(_wall(hi_workers))
    lo_wall = statistics.median(lo_walls)
    hi_wall = statistics.median(hi_walls)
    # throughput = workers/wall jobs/s; efficiency of hi vs lo, per core:
    raw_eff = ((hi_workers / hi_wall) / (lo_workers / lo_wall)) / (hi_workers / lo_workers)
    return {"lo_wall": round(lo_wall, 2), "hi_wall": round(hi_wall, 2),
            "raw_parallel_eff": round(raw_eff, 3)}


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def main() -> None:
    n_pages = int(os.environ.get("SCALING_PAGES", "80000"))
    repeats = int(os.environ.get("SCALING_REPEATS", "5"))
    cold_pages = int(os.environ.get("SCALING_COLD_PAGES", "20000"))
    lo_cores = int(os.environ.get("SCALING_LO", "2"))
    hi_cores = int(os.environ.get("SCALING_HI", "8"))
    factor = hi_cores / lo_cores

    cal = calibrate(lo_cores, hi_cores)
    print(f"# raw-CPU calibration: {cal}", flush=True)

    pairs = []
    for i in range(repeats):
        # SAME-PHASE ceiling: calibrate immediately before each pair, so a
        # hypervisor storm that throttles the 4N level is measured by the
        # busy-loops too (the single session-start calibration missed
        # storms that arrived later — 2026-08-17 batch B measured job
        # pairs at 0.23-0.43 while its session-start ceiling read 0.949)
        pcal = calibrate(lo_cores, hi_cores)
        lo = run_level(lo_cores, n_pages)
        hi = run_level(hi_cores, n_pages)
        eff = lo["secs"] / hi["secs"] / factor
        norm = min(eff / pcal["raw_parallel_eff"], 1.0)
        pairs.append({"i": i, "lo": lo, "hi": hi, "eff": round(eff, 3),
                      "cal": pcal, "norm_eff": round(norm, 3)})
        print(f"# pair {i}: {lo_cores}c={lo['secs']}s {hi_cores}c={hi['secs']}s "
              f"eff={eff:.3f} ceiling={pcal['raw_parallel_eff']:.3f} norm={norm:.3f}",
              flush=True)
    cold_lo = run_level(lo_cores, cold_pages, "cold")
    cold_hi = run_level(hi_cores, cold_pages, "cold")
    print(f"# cold: {lo_cores}c={cold_lo['secs']}s {hi_cores}c={cold_hi['secs']}s", flush=True)

    effs = [p["eff"] for p in pairs]
    norm_effs = [p["norm_eff"] for p in pairs]
    lo_secs = [p["lo"]["secs"] for p in pairs]
    hi_secs = [p["hi"]["secs"] for p in pairs]
    lo_dps = [p["lo"]["docs_per_sec"] for p in pairs]
    hi_dps = [p["hi"]["docs_per_sec"] for p in pairs]
    med_eff = statistics.median(effs)
    # ratio-of-medians: with the VM's bimodal phases, a pair inherits
    # whichever phase one of its two windows landed in; the per-level median
    # over all runs rejects the minority phase on EACH side independently,
    # so this estimator is the more phase-robust of the two. Both are
    # printed; neither is a best-pair.
    rom_eff = statistics.median(lo_secs) / statistics.median(hi_secs) / factor
    result = {
        "lo_cores": lo_cores, "hi_cores": hi_cores,
        "pairs": pairs,
        "median_eff": round(med_eff, 3),
        "ratio_of_medians_eff": round(rom_eff, 3),
        "median_norm_eff": round(statistics.median(norm_effs), 3),
        "eff_min": min(effs), "eff_max": max(effs),
        "cold": {"lo": cold_lo, "hi": cold_hi},
        "calibration": cal,
    }
    print(json.dumps(result))

    ts = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    headline = f"""## Headline (median of {repeats} interleaved {lo_cores}/{hi_cores}-core pairs, {n_pages} pages, {ts})

Level choice: N={lo_cores}, 4N={hi_cores}. The driver brief allows "N and
4N cores"; this box advertises 32 CPUs but the hypervisor delivers far
fewer (raw busy-loop calibration below), so 8→32 measures oversubscription,
not the engine. {lo_cores}→{hi_cores} is the largest 4x step the hardware
can physically honor.

| metric | {lo_cores} cores (N) | {hi_cores} cores (4N) |
|---|---|---|
| wall secs, median (min, max) | {_fmt(lo_secs)} | {_fmt(hi_secs)} |
| docs/sec, median (min, max) | {_fmt(lo_dps)} | {_fmt(hi_dps)} |

- per-pair efficiency ((t_N/t_4N)/4), median: **{med_eff:.3f}**
  (min {min(effs):.3f}, max {max(effs):.3f}; pairs: {', '.join(f'{e:.3f}' for e in effs)})
- ratio-of-medians efficiency (median t_N / median t_4N / 4):
  **{rom_eff:.3f}** — per-level medians reject the VM's minority phase on
  each side independently, where a pair inherits whichever phase either of
  its two windows landed in; both estimators printed, neither is best-pair.
- raw-CPU calibration (pure busy-loops, zero coordination), same levels:
  parallel efficiency **{cal['raw_parallel_eff']:.3f}** — the hardware
  ceiling any job on this box can reach; measured immediately before the
  pairs. 8→32-core raw efficiency measured ~0.4-0.68 across sessions, which
  is why 8/32 is not a usable protocol here.
- PER-PAIR hypervisor-normalized efficiency (each pair / the raw-CPU
  ceiling measured immediately before it), median:
  **{statistics.median(norm_effs):.3f}**
  (pairs: {', '.join(f'{e:.3f}' for e in norm_effs)}) — the scaling loss
  attributable to the ENGINE rather than to what the hypervisor was
  delivering during that pair's window. Session-start ceiling for
  reference: {cal['raw_parallel_eff']:.3f}.

## Cold vs warm (driver-bench reconciliation)

The driver's `bench.py` measures the pipeline COLD-ish (synth + repartition
inside the timed window, after unrelated queries) — the scaling headline is
WARM steady-state (input cached, workers warmed). Both, same session
protocol, {cold_pages} pages:

| mode | Nc secs | Nc docs/s | 4Nc secs | 4Nc docs/s |
|---|---|---|---|---|
| cold (driver-comparable) | {cold_lo['secs']} | {cold_lo['docs_per_sec']} | {cold_hi['secs']} | {cold_hi['docs_per_sec']} |
| warm median (above, {n_pages} pages) | {statistics.median(lo_secs):.2f} | {statistics.median(lo_dps):.1f} | {statistics.median(hi_secs):.2f} | {statistics.median(hi_dps):.1f} |

At 10^12 documents the warm number is the job's throughput (cold start is
0 ppm of the job); the cold number is what a short benchmark sees.
"""

    bench = REPO / "BENCH.md"
    text = bench.read_text() if bench.exists() else "# BENCH\n"
    # replace everything from "## Headline" up to the next section that is
    # neither Headline nor the reconciliation block
    # stop BEFORE the hand-maintained cross-session table (a prior run
    # swallowed it — the lookahead must list every preserved section)
    pat = re.compile(r"## Headline.*?(?=## Cross-session|## Environment variance|## Cold-start economics|## Run log|\Z)",
                     re.S)
    if pat.search(text):
        text = pat.sub(headline + "\n", text, count=1)
    else:
        text += "\n" + headline
    if "## Run log" not in text:
        text += (
            "\n## Run log (bench_scaling.py appends; one row per pair)\n\n"
            "| pages | Nc secs | Nc docs/s | 4Nc secs | 4Nc docs/s | efficiency |\n"
            "|---|---|---|---|---|---|\n"
        )
    for p in pairs:
        text += (f"| {p['lo']['pages']} | {p['lo']['secs']} | {p['lo']['docs_per_sec']} "
                 f"| {p['hi']['secs']} | {p['hi']['docs_per_sec']} | {p['eff']:.3f} |\n")
    bench.write_text(text)
    print("rewrote BENCH.md headline; appended run log")


if __name__ == "__main__":
    main()
