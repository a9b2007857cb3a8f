"""10x-scale smoke (VERDICT r4 task 5): run the heaviest suite entries
once each over the replicated 10x table directory (make_bigsf.py) and
the KG flagship over a 10x pages corpus, verifying completion + row
counts at genuinely large block counts and recording wall times for
BASELINE.md.  One JSON line on stdout.

Usage::

    python tools/make_bigsf.py            # once
    python tools/bench_10x.py [big_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEAVY = [
    "trade_graph_components",
    "doc_minhash_dedup",
    "doc_quality_classifier",
    "customer_fuzzy_name_pairs",
    "q2_min_cost_supplier",
    "trade_graph_max_spanning_forest",
    "q8_market_share",
    "events_asof_last_purchase",
    "events_gap_percentiles",
    "orders_percent_rank",
    "part_skyline",
]


def main() -> None:
    big = sys.argv[1] if len(sys.argv) > 1 else "/tmp/renard_ray_bigsf"
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=cpus, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    out: dict = {}
    for name in HEAVY:
        t0 = time.time()
        res = qs[name](big)
        try:
            from ray.data import Dataset

            n = res.count() if isinstance(res, Dataset) else len(res)
        except Exception as exc:  # pragma: no cover - smoke must be loud
            out[name] = {"error": str(exc)[:200]}
            continue
        out[name] = {"sec": round(time.time() - t0, 2), "rows": int(n)}

    # flagship at 10x the bench default corpus (40 pages/doc = 200k pages)
    from bench import run_kg_flagship

    kg = run_kg_flagship("/root/testdata/sf0.1", pages_per_doc=40, repeats=1)
    out["kg_flagship_10x"] = {
        "sec": round(kg["sec"], 2),
        "docs_per_sec": kg["docs_per_sec"],
        "n_pages": kg["pages"],
    }
    print(json.dumps({"metric": "bench_10x", "cpus": cpus, "queries": out}))
    ray.shutdown()


if __name__ == "__main__":
    main()
