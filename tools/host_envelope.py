#!/usr/bin/env python
"""No-Ray host-envelope control for the scaling gate.

Scores a fixed synthetic page set with pure ``multiprocessing`` at the
same worker counts the Ray pools use at 8 and 32 CPUs (6 and 30 under the
CPUs-2 headroom rule). The throughput ratio bounds anything Ray can show
on this single box: the workers share one memory bus, allocator and VM
scheduler, so on a noisy night the envelope collapses REGARDLESS of
framework (measured 4.2x from 6->30 procs on round 3's night vs 2.4x on
round 4's — same code both nights). On a real N vs 4N NODE cluster each
node keeps its own memory bus and object store, so the single-box ratio
strictly understates multi-node scaling. Run this alongside any scaling
campaign; controls + envelope together say whether a low efficiency
reading is code or host.
"""
import os
import sys
import time
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from multiprocessing import Pool


def work(args):
    lo, hi = args
    from raykg.config import KG_LABELS
    from raykg.oracle import Oracle
    from raykg.sources.pages import make_page_row

    o = Oracle()
    n = 0
    for i in range(lo, hi):
        row = make_page_row(i % 5000, "filler", "en")
        n += len(o.extract_page(row["url"], row["html"], KG_LABELS).triples)
    return n


def run(procs: int, total: int) -> float:
    step = max(1, total // (procs * 4))
    chunks = [(i, min(i + step, total)) for i in range(0, total, step)]
    t0 = time.perf_counter()
    with Pool(procs) as p:
        sum(p.map(work, chunks))
    return time.perf_counter() - t0


if __name__ == "__main__":
    import json

    total = int(os.environ.get("N_DOCS", "30000"))
    out = {"docs": total, "rounds": []}
    for procs in (6, 30, 6, 30):
        w = run(procs, total)
        out["rounds"].append({"procs": procs, "wall_s": round(w, 2),
                              "docs_per_s": round(total / w, 1)})
    best = {p: max(r["docs_per_s"] for r in out["rounds"] if r["procs"] == p)
            for p in (6, 30)}
    out["envelope_6_to_30"] = round(best[30] / best[6], 3)
    out["envelope_norm_4x"] = round(best[30] / best[6] / 4.0, 3)
    print(json.dumps(out))
