"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry at the given sf and compare with ``oracle_sql()``
via DuckDB (row count + column names + order-insensitive values).

Usage: python tools/check_entry.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    assert isinstance(res, pd.DataFrame), type(res)
    return res


def canon(df):
    df = df.copy()
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main():
    import duckdb
    import ray

    import __ray_entry__ as e

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"[FAIL] {name}: engine raised {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"[rows-only] {name}: {len(mine)} rows, "
                  f"cols={list(mine.columns)}")
            continue
        try:
            oracle = canon(con.sql(sql).df())
        except Exception as ex:
            print(f"[FAIL] {name}: oracle SQL raised {ex}")
            failures.append(name)
            continue
        ok = True
        if list(mine.columns) != list(oracle.columns):
            print(f"[FAIL] {name}: columns {list(mine.columns)} vs "
                  f"{list(oracle.columns)}")
            ok = False
        elif len(mine) != len(oracle):
            print(f"[FAIL] {name}: rows {len(mine)} vs {len(oracle)}")
            ok = False
        else:
            import numpy as np
            for c in mine.columns:
                a, b = mine[c].to_numpy(), oracle[c].to_numpy()
                # the driver's value-hash is dtype-sensitive (round-1
                # ts_doc_len lesson: DuckDB HUGEINT vs engine int64) —
                # flag any numeric dtype divergence, not just values
                if a.dtype != b.dtype:
                    print(f"[FAIL] {name}: column {c} dtype "
                          f"{a.dtype} vs oracle {b.dtype}")
                    ok = False
                    break
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    same = np.allclose(a.astype(float), b.astype(float),
                                       atol=1e-9, rtol=0)
                else:
                    same = (a.astype(str) == b.astype(str)).all() \
                        if a.dtype.kind in "OU" else (a == b).all()
                if not same:
                    bad = np.flatnonzero(
                        ~(a == b) if a.dtype.kind not in "fOU"
                        else ~(a.astype(str) == b.astype(str)))[:5]
                    print(f"[FAIL] {name}: column {c} mismatch at rows "
                          f"{bad.tolist()}: mine={a[bad][:5]} "
                          f"oracle={b[bad][:5]}")
                    ok = False
                    break
        if ok:
            print(f"[OK]   {name}: {len(mine)} rows match oracle")
        else:
            failures.append(name)
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
