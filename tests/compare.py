"""Spark-vs-DuckDB result comparison mirroring the driver's gate:
row count + column names + order-insensitive exact values (columns
sorted by name, rows sorted by all columns)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            # decimal.Decimal leaking through would break equality
            non_null = s.dropna()
            if len(non_null) and all(hasattr(v, "as_tuple") for v in non_null.head(5)):
                out[c] = s.astype("float64")
    out = out[sorted(out.columns)]
    if len(out):
        out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def assert_same(spark_df, duck_rel, name: str = "query") -> None:
    assert_same_pdf(spark_df.toPandas(), duck_rel, name)


def assert_same_pdf(spark_pdf: pd.DataFrame, duck_rel, name: str = "query") -> None:
    a = normalize(spark_pdf)
    b = normalize(duck_rel.df())
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch spark={list(a.columns)} duck={list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count spark={len(a)} duck={len(b)}"
    # dtype-strict, mirroring the driver's value-hash: a numerically
    # equal result with a different physical type (e.g. DuckDB HUGEINT
    # from SUM(int) vs Spark BIGINT) must FAIL here, not only at the
    # driver gate.
    for c in a.columns:
        assert a[c].dtype == b[c].dtype, (
            f"{name}: dtype mismatch on {c!r}: spark={a[c].dtype} duck={b[c].dtype}"
        )
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype("float64")
            bv = bv.astype("float64")
            both_nan = pd.isna(av) & pd.isna(bv)
            eq = (av == bv) | both_nan
        else:
            eq = pd.Series(av).eq(pd.Series(bv)) | (pd.isna(av) & pd.isna(bv))
            eq = eq.to_numpy()
        if not eq.all():
            idx = int(np.argmin(eq))
            raise AssertionError(
                f"{name}: column {c!r} differs at sorted row {idx}: "
                f"spark={av[idx]!r} duck={bv[idx]!r} "
                f"({int((~eq).sum())}/{len(eq)} rows differ)"
            )
