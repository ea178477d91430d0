#!/usr/bin/env python
"""raykg benchmark harness.

Plain run: executes the headline KG-construction pipeline (pages →
extraction → mention/relation actors → canonicalize → graph materialize)
over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) plus the operator
sub-benchmarks, in one Ray session with
``num_cpus=int($RAY_GRAFT_CPUS or 32)``, and prints ONE JSON line::

  {"metric": "kg_pipeline_sec", "value": N, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "pages": P, "triples": T, "triples_per_sec": R}

``--scaling``: runs the headline pipeline twice in FRESH processes at
num_cpus=8 and num_cpus=32 over the SAME pre-materialized input and prints
both throughputs + scaling efficiency (the in-sandbox evidence protocol for
the north rule's two-cluster-size criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import warnings

warnings.filterwarnings("ignore")

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("GRAFT_BENCH_REPEAT", "8"))
# Headline = best of N pipeline rounds, each preceded by a fixed CONTROL
# workload. This host is a shared VM whose single-run walls vary up to ±2×
# (BASELINE.md's drift analysis; the round-2 driver artifact vs repo-baseline
# contradiction came exactly from this). min-of-N estimates machine
# capability; the recorded control walls witness whether a slow round was
# the code or the host.
KG_ROUNDS = int(os.environ.get("GRAFT_KG_ROUNDS", "3"))
KG_ONLY = os.environ.get("GRAFT_KG_ONLY") == "1"   # scaling subprocesses:
                                                   # skip operator sub-benchmarks
PAGES_CACHE = os.environ.get("GRAFT_PAGES_DIR",
                             f"/tmp/raykg_bench/pages_{os.path.basename(SF_DIR)}_x{REPEAT}")


def _sf_label() -> float:
    base = os.path.basename(SF_DIR.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def ensure_pages(num_files: int = 32) -> None:
    """Materialize the pages corpus once; reused (and page-cache-warmed)
    across runs and parallelism levels so the bench measures compute +
    shuffle, not first disk write."""
    marker = os.path.join(PAGES_CACHE, "_DONE")
    if os.path.exists(marker):
        return
    from raykg.sources.pages import write_pages_parquet

    if os.path.exists(PAGES_CACHE):
        shutil.rmtree(PAGES_CACHE)
    write_pages_parquet(SF_DIR, PAGES_CACHE, repeat=REPEAT, num_files=num_files)
    open(marker, "w").write("ok")


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    ensure_pages()
    # untimed warm pass over the input (page cache)
    import ray.data as rd

    rd.read_parquet(PAGES_CACHE).count()

    from raykg.functions import relational
    from raykg.pipelines.kg import run_kg_pipeline

    def control_sec() -> float:
        t0 = time.perf_counter()
        relational.q_lineitem_agg(SF_DIR).count()
        return round(time.perf_counter() - t0, 3)

    import glob

    import pyarrow.parquet as pq

    walls: list[float] = []
    controls: list[float] = []
    n_pages = 0
    n_triples = 0
    for rnd in range(max(1, KG_ROUNDS)):
        controls.append(control_sec())
        out_dir = tempfile.mkdtemp(prefix="raykg_bench_out_")
        t0 = time.perf_counter()
        # one shard for the timed run: per-shard fixed overhead (pool
        # spin-up, write barrier) is a resume-granularity tradeoff, not
        # throughput — resume is exercised by pytest, the bench measures
        # compute+shuffle
        summary = run_kg_pipeline(PAGES_CACHE, out_dir, link=False,
                                  shard_size=64)
        walls.append(round(time.perf_counter() - t0, 3))
        n_pages = summary["stages"]["extract"]["rows"]
        if rnd == 0:       # output is bit-identical across rounds
            for f in glob.glob(os.path.join(out_dir, "edges", "*.parquet")):
                t = pq.read_table(f, columns=["weight"])
                n_triples += sum(t.column("weight").to_pylist())
        shutil.rmtree(out_dir, ignore_errors=True)
    kg_sec = min(walls)

    # operator sub-benchmarks (each consumed to completion)
    queries = {"kg_pipeline": round(kg_sec, 3)}

    def timed(name, fn):
        t = time.perf_counter()
        fn(SF_DIR).count()
        queries[name] = round(time.perf_counter() - t, 3)

    if not KG_ONLY:
        # links stage (north-rule component): extract a 1× sample of the
        # corpus, build the canonical catalog, link every mention
        # (brute-force path)
        t = time.perf_counter()
        from raykg.pipelines.kg import extract_stage
        from raykg.sources.pages import pages_dataset
        from raykg.stages.canonicalize import canonicalize
        from raykg.stages.link import build_catalog, link_mentions
        from raykg.stages.mention import explode_mentions

        ex = extract_stage(pages_dataset(SF_DIR, repeat=1)).materialize()
        mentions = ex.map_batches(explode_mentions, batch_format="pyarrow")
        nodes = canonicalize(mentions).materialize()
        catalog_ref = ray.put(build_catalog(nodes))
        link_mentions(mentions, catalog_ref).count()
        queries["kg_links_sample"] = round(time.perf_counter() - t, 3)

        from raykg.functions import dedup, similarity, textstats, windows

        timed("lineitem_agg", relational.q_lineitem_agg)
        timed("mktsegment_orders", relational.q_mktsegment_orders)
        timed("events_hourly", windows.q_events_hourly)
        timed("sessions", windows.q_sessions)
        timed("doc_stats", textstats.q_doc_stats)
        timed("dedup_exact", dedup.q_dedup_exact)
        timed("dedup_minhash", dedup.q_dedup_minhash)
        timed("knn", similarity.q_knn)
        timed("dedup_embedding", dedup.q_dedup_embedding)
        timed("langid", textstats.q_langid)
        timed("token_df", textstats.q_token_df)
        timed("split", textstats.q_split)

    result = {
        "metric": "kg_pipeline_sec",
        "value": round(kg_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": _sf_label(),
        "num_cpus": NUM_CPUS,
        "pages": int(n_pages),
        "triples": int(n_triples),
        "triples_per_sec": round(n_triples / kg_sec, 1) if kg_sec > 0 else 0,
        "kg_pipeline_walls": walls,
        "control_sec": controls,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job, same input, fresh processes at 8 and 32 CPUs.

    Uses a LARGER corpus multiple (GRAFT_SCALING_REPEAT, default 96) than the
    plain bench: scaling efficiency measures how the COMPUTE scales, so the
    job must be big enough that fixed per-run overhead (actor pool spin-up,
    shuffle scheduling, output commit — identical at both widths) doesn't
    mask it; at the target 100 TB these overheads are noise by construction.

    Rounds are INTERLEAVED (8,32,8,32,…) so shared-VM host drift hits both
    widths symmetrically instead of biasing whichever side ran during a
    noisy window (the round-2 campaign critique); each side's estimate is
    the min over its rounds, and each subprocess records its own control
    walls (`control_sec`) as the drift witness."""
    scaling_repeat = int(os.environ.get("GRAFT_SCALING_REPEAT", "96"))
    pairs = int(os.environ.get("GRAFT_SCALING_ROUNDS", "3"))

    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR,
                   GRAFT_BENCH_REPEAT=str(scaling_repeat),
                   GRAFT_KG_ONLY="1", GRAFT_KG_ROUNDS="1")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True, check=True,
                             cwd=os.path.dirname(os.path.abspath(__file__))).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    runs: dict[int, list[dict]] = {lo: [], hi: []}
    for _ in range(pairs):
        runs[lo].append(run_once(lo))
        runs[hi].append(run_once(hi))
    r_lo = min(runs[lo], key=lambda r: r["value"])
    r_hi = min(runs[hi], key=lambda r: r["value"])
    speedup = r_lo["value"] / r_hi["value"] if r_hi["value"] > 0 else 0.0
    eff = speedup / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "triples_per_sec_8": r_lo["triples_per_sec"],
        "triples_per_sec_32": r_hi["triples_per_sec"],
        "speedup": round(speedup, 3),
        "sf": _sf_label(),
        "pages": r_hi["pages"],
        "walls_8": [r["value"] for r in runs[lo]],
        "walls_32": [r["value"] for r in runs[hi]],
        "controls_8": [r["control_sec"][0] for r in runs[lo]],
        "controls_32": [r["control_sec"][0] for r in runs[hi]],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
