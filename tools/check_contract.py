"""Local mimic of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same sf directory, compare row count, column names, and values
(sorted columns, order-insensitive rows, NaN-aware).

Usage: python tools/check_contract.py [--exact] [sf_dir] [query ...]

``--exact`` compares float columns by their raw IEEE-754 bytes (after
canonicalizing NaN) instead of allclose — the driver hashes raw value
bytes, so this mode catches sign-of-zero (-0.0 vs +0.0) and last-ulp
divergences that allclose is blind to.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].where(df[c].notna(), None)
    sort_cols = list(df.columns)
    try:
        return df.sort_values(sort_cols, kind="mergesort", na_position="last").reset_index(drop=True)
    except Exception:
        return df.reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame, exact: bool = False) -> str | None:
    if len(a) != len(b):
        return f"row count {len(a)} vs {len(b)}"
    if sorted(a.columns) != sorted(b.columns):
        return f"columns {sorted(a.columns)} vs {sorted(b.columns)}"
    a, b = norm(a), norm(b)
    for c in a.columns:
        x, y = a[c], b[c]
        if x.dtype.kind == "f" or y.dtype.kind == "f":
            xv = x.to_numpy(dtype=float)
            yv = y.to_numpy(dtype=float)
            if exact:
                # canonical NaN, then raw IEEE-754 byte equality (mimics
                # the driver's value hash: catches -0.0 vs +0.0)
                xb = np.where(np.isnan(xv), np.nan, xv)
                yb = np.where(np.isnan(yv), np.nan, yv)
                if xb.tobytes() != yb.tobytes():
                    bad = xb.view(np.uint64) != yb.view(np.uint64)
                    return (
                        f"float col {c} BIT-mismatch: {xb[bad][:3]} vs "
                        f"{yb[bad][:3]} ({bad.sum()} rows)"
                    )
            elif not np.allclose(xv, yv, rtol=1e-9, atol=1e-9, equal_nan=True):
                bad = ~np.isclose(xv, yv, rtol=1e-9, atol=1e-9, equal_nan=True)
                return f"float col {c}: {xv[bad][:3]} vs {yv[bad][:3]} ({bad.sum()} rows)"
        else:
            xv = x.astype(object).where(x.notna(), None).tolist()
            yv = y.astype(object).where(y.notna(), None).tolist()
            if xv != yv:
                bad = [(i, p, q) for i, (p, q) in enumerate(zip(xv, yv)) if p != q]
                return f"col {c}: {bad[:3]} ({len(bad)} rows)"
    return None


def main():
    args = [a for a in sys.argv[1:] if a != "--exact"]
    exact = "--exact" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod
    from astrospectro_spark.session import get_spark

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = get_spark(app_name="contract_check", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL] {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL] {name}: duckdb error {str(e)[:200]}")
            continue
        err = compare(got, want, exact=exact)
        if err:
            failures.append((name, err))
            print(f"[FAIL] {name}: {err}")
        else:
            print(f"[ok] {name}: {len(got)} rows")
    print(f"\n{len(failures)} failures / {len(qs)} queries")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
