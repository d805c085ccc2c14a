"""pandas_udf registry: scalar and grouped-aggregate vectorized UDFs.

Usage::

    from gazelle_plugin_spark.functions import register_builtin_udfs
    register_builtin_udfs(spark)
    spark.sql("SELECT url_decode(u) FROM t")

UDFs are the slow path (Arrow transfer + Python execution) — every
built-in here exists because the logic is NOT expressible with
pyspark.sql.functions; anything expressible stays JVM-side. Scale
note: pandas_udf processes Arrow batches (session profile sizes them
at 20480 rows), so per-call Python overhead amortizes; never use
row-at-a-time ``F.udf`` in a hot path.
"""

from __future__ import annotations

import math
import urllib.parse
from collections.abc import Callable

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DataType

#: name -> (pandas_udf, doc) registered by register_builtin_udfs
BUILTIN_UDFS: dict[str, tuple[object, str]] = {}


def register_scalar(
    spark: SparkSession,
    name: str,
    fn: Callable[..., pd.Series],
    return_type: DataType | str,
):
    """Register ``fn`` (pd.Series -> pd.Series) as a scalar vectorized
    UDF, callable from SQL and DataFrame code (ColumnarUDF registry
    analog — but open, not a hardcoded name list)."""
    udf = F.pandas_udf(fn, return_type)
    spark.udf.register(name, udf)
    return udf


def register_grouped_agg(
    spark: SparkSession,
    name: str,
    fn: Callable[..., object],
    return_type: DataType | str,
):
    """Register a grouped-aggregate vectorized UDF (pd.Series ->
    scalar) — the UDAF surface the reference lacked natively
    (docs/operators.md:26-27 row fallback; SURVEY.md §2.10)."""
    # fn's `pd.Series -> scalar` type hints make pandas_udf infer the
    # grouped-agg eval type (the PandasUDFType enum is deprecated)
    udf = F.pandas_udf(fn, return_type)
    spark.udf.register(name, udf)
    return udf


def register_udtf(spark: SparkSession, name: str, cls: type, return_type: str):
    """Register a Python UDTF (table function) — completes the
    UDF/UDAF/UDTF triple the reference left on the row-fallback path
    (SURVEY.md §2.10: 'UDAF / UDTF: none native'). Spark >= 3.5 runs
    these Arrow-batched like pandas UDFs."""
    from pyspark.sql.functions import udtf

    wrapped = udtf(cls, returnType=return_type)
    spark.udtf.register(name, wrapped)
    return wrapped


# ---------------------------------------------------------------- built-ins

def _url_decode(s: pd.Series) -> pd.Series:
    """The reference's worked UDF example (ColumnarUDF.scala:90-117
    maps URLDecoder to a Gandiva function)."""
    return s.map(lambda v: urllib.parse.unquote(v) if v is not None else None)


def _url_encode(s: pd.Series) -> pd.Series:
    return s.map(lambda v: urllib.parse.quote(v) if v is not None else None)


def _text_entropy(s: pd.Series) -> pd.Series:
    """Shannon entropy of the character distribution — a quality
    signal for training-data curation not expressible with built-ins."""

    def ent(v: str | None) -> float | None:
        if v is None or not v:
            return None if v is None else 0.0
        counts: dict[str, int] = {}
        for ch in v:
            counts[ch] = counts.get(ch, 0) + 1
        n = len(v)
        return -sum((c / n) * math.log2(c / n) for c in counts.values())

    return s.map(ent)


def _geo_mean(v: pd.Series) -> float:
    """Grouped-agg example: geometric mean (no Spark built-in)."""
    x = v.dropna()
    if not len(x):
        return float("nan")
    return float(math.exp((x.map(math.log)).mean()))


class _SplitNgrams:
    """Built-in UDTF example: explode a string into its word n-grams
    with positions — the lateral-view shape (1 row -> N rows with
    extra computed columns) that a plain scalar UDF can't produce."""

    def eval(self, text: str, n: int):  # noqa: A002
        if text is None:
            return
        words = text.split(" ")
        for i in range(max(len(words) - n + 1, 0)):
            yield i, " ".join(words[i : i + n])


def register_builtin_udfs(spark: SparkSession) -> dict[str, tuple[object, str]]:
    """Install the built-in registry into ``spark`` and return it."""
    BUILTIN_UDFS["split_ngrams"] = (
        register_udtf(spark, "split_ngrams", _SplitNgrams, "pos int, ngram string"),
        "UDTF: explode text into positioned word n-grams",
    )
    BUILTIN_UDFS["url_decode"] = (
        register_scalar(spark, "url_decode", _url_decode, "string"),
        "percent-decode a URL-encoded string",
    )
    BUILTIN_UDFS["url_encode"] = (
        register_scalar(spark, "url_encode", _url_encode, "string"),
        "percent-encode a string",
    )
    BUILTIN_UDFS["text_entropy"] = (
        register_scalar(spark, "text_entropy", _text_entropy, "double"),
        "Shannon entropy (bits/char) of the character distribution",
    )
    BUILTIN_UDFS["geo_mean"] = (
        register_grouped_agg(spark, "geo_mean", _geo_mean, "double"),
        "geometric mean (grouped aggregate)",
    )
    return dict(BUILTIN_UDFS)


def grouped_zscore(df, group_cols: list[str], value_col: str):
    """Grouped-map applyInPandas example: per-group z-score — the
    grouped-transform shape of the custom-operator ladder (pandas gets
    ONE group per call, Arrow-batched). NOTE: expressible with window
    functions too (see tests for the equivalence gate); real uses are
    transforms that need full-group pandas/numpy logic (per-group
    model fits, resampling, rank-based normalization).

    Scale: one shuffle on the group key; each group must fit in one
    worker's memory — for billion-row groups use the window form."""
    import pandas as pd  # noqa: F811

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, zscore double"

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf[value_col].std(ddof=1)
        mu = pdf[value_col].mean()
        pdf = pdf.copy()
        pdf["zscore"] = (pdf[value_col] - mu) / sd if sd and sd > 0 else 0.0
        return pdf

    return df.groupBy(*group_cols).applyInPandas(zscore, schema)
