"""Salted two-phase aggregation matches the unsalted result, and the
hub-entity fixture flows through the KG pipeline."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest


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


def test_skew_aware_join_matches_plain_join(ray_session):
    """With a planted hub key, the hot-key broadcast split must produce
    exactly the rows of a plain hash join."""
    import numpy as np
    import pandas as pd
    import ray

    from renard_ray.ops.skew import skew_aware_join

    rng = np.random.RandomState(6)
    n = 3000
    # key 7 is the hub: 80% of the left side
    keys = np.where(rng.uniform(size=n) < 0.8, 7, rng.randint(0, 50, size=n))
    left = pd.DataFrame(
        {"k": keys.astype("int64"), "lval": np.arange(n, dtype="int64")}
    )
    right = pd.DataFrame(
        {"rk": np.arange(0, 40, dtype="int64"), "rval": np.arange(100, 140, dtype="int64")}
    )
    lds = ray.data.from_pandas(left)
    rds = ray.data.from_pandas(right)

    got = (
        skew_aware_join(lds, rds, on="k", right_on="rk", hot_threshold=100)
        .to_pandas()
        .sort_values(["k", "lval"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="k", right_on="rk")
        .drop(columns=["rk"])
        .sort_values(["k", "lval"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got["lval"].tolist() == want["lval"].tolist()
    assert got["rval"].tolist() == want["rval"].tolist()

    # no hot keys -> pure hash-join path, same result shape
    got2 = (
        skew_aware_join(lds, rds, on="k", right_on="rk", hot_threshold=10**9)
        .to_pandas()
    )
    assert len(got2) == len(want)


def test_skew_aware_join_right_hot_and_budget(ray_session):
    """A RIGHT-side hub key takes the broadcast-LEFT strategy, and a key
    heavy on both sides falls back to the hash join under a tiny
    broadcast budget — rows identical to a plain merge either way."""
    import numpy as np
    import pandas as pd
    import ray

    from renard_ray.ops.skew import skew_aware_join

    rng = np.random.RandomState(9)
    # key 3: right-side hub (many right rows, 2 left rows)
    # key 5: heavy on BOTH sides (fact x fact)
    left = pd.DataFrame(
        {
            "k": np.concatenate(
                [[3, 3], np.full(400, 5), rng.randint(10, 30, size=200)]
            ).astype("int64"),
        }
    )
    left["lval"] = np.arange(len(left), dtype="int64")
    right = pd.DataFrame(
        {
            "rk": np.concatenate(
                [np.full(500, 3), np.full(400, 5), np.arange(10, 30)]
            ).astype("int64"),
        }
    )
    right["rval"] = np.arange(len(right), dtype="int64")
    lds, rds = ray.data.from_pandas(left), ray.data.from_pandas(right)

    want = (
        left.merge(right, left_on="k", right_on="rk")
        .drop(columns=["rk"])
        .sort_values(["k", "lval", "rval"])
        .reset_index(drop=True)
    )
    # budget of 10 rows: key 3 broadcasts its 2 LEFT rows; key 5
    # (min side 400) exceeds the budget and stays in the hash join
    got = (
        skew_aware_join(
            lds, rds, on="k", right_on="rk", hot_threshold=300,
            broadcast_row_cap=10,
        )
        .to_pandas()
        .sort_values(["k", "lval", "rval"])
        .reset_index(drop=True)
    )
    assert got["lval"].tolist() == want["lval"].tolist()
    assert got["rval"].tolist() == want["rval"].tolist()


def test_broadcast_join_fallback_parity(ray_session, monkeypatch):
    """The size-adaptive broadcast semi/anti/lookup joins and their
    hash-join fallbacks return identical rows: every rewritten query is
    run once on the broadcast path and once with the row budget forced
    to 0 (everything falls back)."""
    import pandas as pd

    from renard_ray.ops import relational

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("testdata not present")
    queries = {
        "q3": relational.q3_top_unshipped_orders,
        "q4": relational.q4_order_priority,
        "q5": relational.q5_nation_revenue,
        "anti": relational.customers_without_orders,
        "hist": relational.customer_order_history,
    }
    fast = {k: fn(sf).to_pandas() for k, fn in queries.items()}
    monkeypatch.setattr(relational, "_BCAST_ROW_LIMIT", 0)
    slow = {k: fn(sf).to_pandas() for k, fn in queries.items()}
    for k in queries:
        a = fast[k].sort_values(list(fast[k].columns)).reset_index(drop=True)
        b = slow[k][list(fast[k].columns)].sort_values(
            list(fast[k].columns)
        ).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_broadcast_join_null_key_parity(ray_session, monkeypatch):
    """Null join keys behave identically on the broadcast path and the
    hash-join fallback (SQL semantics: null never matches null)."""
    import pandas as pd
    import ray

    from renard_ray.ops import relational

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, None, 4], pa.int64()),
                  "v": pa.array([10, 20, 30, 40], pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([1, None], pa.int64()),
                  "p": pa.array([100, 200], pa.int64())})
    )

    def run_all():
        return (
            relational.broadcast_semi_join(left, right, on="k", right_on="rk")
            .to_pandas(),
            relational.broadcast_semi_join(
                left, right, on="k", right_on="rk", anti=True
            ).to_pandas(),
            relational.broadcast_lookup_join(
                left, right, on="k", right_on="rk", payload=["p"]
            ).to_pandas(),
        )

    fast = run_all()
    monkeypatch.setattr(relational, "_BCAST_ROW_LIMIT", 0)
    slow = run_all()
    for f, s in zip(fast, slow):
        f = f.sort_values(["v"]).reset_index(drop=True)
        s = s[list(f.columns)].sort_values(["v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(f, s, check_dtype=False)
    # and the semantics themselves: null-key left row only in ANTI
    assert fast[0]["v"].tolist() == [10]
    assert sorted(fast[1]["v"].tolist()) == [20, 30, 40]
    assert fast[2]["v"].tolist() == [10]
