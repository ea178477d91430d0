"""sf0.1 oracle pass (VERDICT r4 #8): the driver's rows/schema/value-hash
compare only ever runs at sf0.001/0.01, where several adaptive operators
(bucketed_group_apply's driver fast path vs the distributed shuffle,
adaptive_sort's single-task vs range sort) take their SMALL-input branch.
This tool replays the same compare at sf0.1 — bench scale — so the branch
actually taken under load is the one that's been value-checked.

Run:  python tools/oracle_sf01.py [sf_dir] [out_json]
Writes one JSON artifact (default ORACLE_SF01.json at the repo root) with
per-query pass/fail + wall seconds. Query set: the cheapest oracled
queries (no KG tail and no mention oracles — the engine dumps those rely
on (kg_*: the whole flagship; kg_mentions/legacy_mentions: a second full
extraction pass + recursive-CTE NMS over millions of pre-NMS candidates)
would re-run bench-scale work per query; their adaptive branches are
separately pinned by pytest at forced budgets, and their oracle compare
runs at sf0.001 AND sf0.01 in the suite / driver).
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
for p in (_REPO, os.path.join(_REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

# the 12 cheapest oracled queries (sub-second to a few seconds at sf0.1)
QUERIES = [
    "lineitem_agg", "mktsegment_orders", "orders_monthly", "top_parts",
    "customers_without_orders", "asof_prev_view", "top_orders_per_segment",
    "events_hourly", "events_sliding", "sessions",
    "doc_stats", "langid",
]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(_REPO, "ORACLE_SF01.json")
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from driver_emu import run

    report: dict = {"sf_dir": sf, "queries": {}}
    ok = True
    for name in QUERIES:
        t0 = time.perf_counter()
        problems = run(sf, only=[name]).get(name, ["query missing"])
        report["queries"][name] = {
            "pass": not problems,
            "problems": problems,
            "wall_s": round(time.perf_counter() - t0, 2),
        }
        ok &= not problems
        print(f"{name:26s} {'OK' if not problems else problems}")
    report["all_pass"] = ok
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}  all_pass={ok}")
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
