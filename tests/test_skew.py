"""Salted two-phase aggregation matches the unsalted result, and the
hub-entity fixture flows through the KG pipeline."""

from __future__ import annotations

import pyarrow as pa


def test_salted_groupby_sum_matches_plain(ray_session):
    import random

    import ray
    from ray.data.aggregate import Sum

    from renard_ray.ops.skew import salted_groupby_sum

    rng = random.Random(5)
    # heavy skew: key "hub" holds 80% of rows
    rows = [
        {"k": "hub" if rng.random() < 0.8 else f"k{rng.randrange(20)}", "v": rng.randrange(100)}
        for _ in range(5000)
    ]
    ds = ray.data.from_items(rows)
    plain = {
        r["k"]: r["v"]
        for r in ds.groupby("k").aggregate(Sum("v", alias_name="v")).take_all()
    }
    salted = {
        r["k"]: r["v"]
        for r in salted_groupby_sum(ds, ["k"], ["v"], n_salts=8).take_all()
    }
    assert salted == plain


def test_hub_entity_weight_dominates(ray_session):
    """The generator plants Mr. Darcy in ~50% of pages; canonicalized
    triples must route all his aliases to one node whose total degree
    dominates (the skew fixture the north rule asks for)."""
    import ray

    from renard_ray.pipelines.kg import KGConfig, build_kg
    from renard_ray.sources.pages import generate_pages_table

    pages = ray.data.from_arrow(generate_pages_table(120, seed=9))
    df = build_kg(pages, KGConfig()).to_pandas()
    by_node = {}
    for r in df.itertuples():
        by_node[r.subj] = by_node.get(r.subj, 0.0) + r.weight
        by_node[r.obj] = by_node.get(r.obj, 0.0) + r.weight
    top = max(by_node, key=by_node.get)
    assert "Darcy" in top
    # no leftover un-canonicalized Darcy aliases as separate nodes
    darcy_nodes = [n for n in by_node if n.endswith("Darcy") or n == "Darcy"]
    assert len([n for n in darcy_nodes if "Georgiana" not in n]) == 1
