"""Local stand-in for the driver's correctness gate: run queries()[k]
and oracle_sql()[k] side by side over a testdata sf dir and compare
row count, column names, and sorted values.

Usage: python tools/check_driver.py [sf_dir] [key ...]
"""

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res):
    import pyarrow as pa
    import ray.data as rd
    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    keys = sys.argv[2:]
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)
    import __ray_entry__ as entry
    qs = entry.queries()
    oracles = entry.oracle_sql()
    if not keys:
        keys = [k for k in qs if k in oracles]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    for k in keys:
        if k not in oracles:
            df = to_pandas(qs[k](sf_dir))
            print(f"{k}: NO_ORACLE rows={len(df)}")
            continue
        try:
            mine = norm(to_pandas(qs[k](sf_dir)))
            ora = norm(con.execute(oracles[k]).fetchdf())
        except Exception as e:
            print(f"{k}: ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        ok_rows = len(mine) == len(ora)
        ok_cols = list(mine.columns) == list(ora.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                ok_vals = all(
                    (mine[c].to_numpy() == ora[c].to_numpy()).all()
                    if mine[c].dtype != object
                    else (mine[c].astype(str).to_numpy()
                          == ora[c].astype(str).to_numpy()).all()
                    for c in mine.columns) if len(mine) else True
            except Exception as e:
                ok_vals = f"cmp_err:{e}"
        status = "PASS" if (ok_rows and ok_cols and ok_vals is True) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{k}: {status} rows={len(mine)}/{len(ora)} cols_ok={ok_cols} "
              f"vals={ok_vals}")
        if status == "FAIL" and ok_rows and ok_cols and len(mine):
            for c in mine.columns:
                try:
                    neq = (mine[c].astype(str).to_numpy()
                           != ora[c].astype(str).to_numpy())
                    if neq.any():
                        i = int(np.flatnonzero(neq)[0])
                        print(f"  first diff col={c} row={i}: "
                              f"mine={mine[c].iloc[i]!r} ora={ora[c].iloc[i]!r}")
                except Exception:
                    pass
    print(f"done: {failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
