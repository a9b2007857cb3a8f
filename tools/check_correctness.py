"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir, runs the paired
``oracle_sql()`` in DuckDB over the same parquet tables, and compares
row count, schema (column names sorted) and an order-insensitive value
hash.  Usage::

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    try:
        from ray.data import Dataset

        if isinstance(result, Dataset):
            df = result.to_pandas()
            if len(df) == 0 and len(df.columns) == 0:
                # Ray's to_pandas drops columns on an EMPTY dataset even
                # when the Dataset carries a full schema (e.g. the sf0.001
                # 4-truss is legitimately empty) — rebuild the frame from
                # the schema so the column compare sees the real names
                sch = result.schema()
                if sch is not None:
                    df = pd.DataFrame(
                        {n: pd.Series(dtype=object) for n in sch.names}
                    )
            return df
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    if len(df) == 0:
        return hashlib.md5(b"").hexdigest()
    for c in df.columns:
        df[c] = df[c].astype(str)
    rows = sorted(df.apply("|".join, axis=1).tolist())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=16, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = _to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: ray error {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows, {dt:.1f}s (no oracle)")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        elif value_hash(got) != value_hash(want):
            problems.append("value hash mismatch")
        if problems:
            n_fail += 1
            print(f"FAIL  {name}: {'; '.join(problems)}  ({dt:.1f}s)")
            if sorted(got.columns) == sorted(want.columns) and len(got) and len(want):
                g = got[sorted(got.columns)].astype(str)
                w = want[sorted(want.columns)].astype(str)
                gs = set(map(tuple, g.values.tolist()))
                ws = set(map(tuple, w.values.tolist()))
                extra = list(gs - ws)[:3]
                missing = list(ws - gs)[:3]
                print(f"      extra rows: {extra}")
                print(f"      missing rows: {missing}")
        else:
            print(f"OK    {name}: {len(got)} rows match  ({dt:.1f}s)")
    print("DONE", "failures:", n_fail)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
