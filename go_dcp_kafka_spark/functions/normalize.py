"""Payload text normalization — all vectorized, never per-row Python.

The reference never parses payloads (opaque []byte,
/root/reference/couchbase/event.go:13-14); normalization is our engine's
mapper-level payload work (BASELINE.json north_star: "all payload
normalization of the text column uses vectorized Arrow/pandas UDFs").

Two implementations with identical semantics:
- ``normalize_text_col``: pure Column expressions (JVM-side, whole-stage
  codegen — the fast path, preferred);
- ``normalize_text_pandas``: an Arrow-batched pandas UDF (the slow-path
  pattern, for transforms built-ins can't express, e.g. Unicode NFC).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def normalize_text_col(col: Column | str = "text") -> Column:
    """Trim + collapse internal whitespace runs to single spaces (JVM-side).

    The explicit char class is Java's exact ``\\s`` set but ~2x faster than
    the predefined class (no Unicode-aware dispatch); regexp_replace/trim are
    null-safe so no guard is needed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(c), "[ \\t\\n\\x0B\\f\\r]+", " ")


# DataType object (not a DDL string): avoids needing an active SparkContext
# at import time to parse the type.
@pandas_udf(T.StringType())
def normalize_text_pandas(s: pd.Series) -> pd.Series:
    """Arrow-batched equivalent + Unicode NFC. Vectorized pandas str ops on
    the whole batch — no Python-per-row loop beyond the NFC call (which has
    no vectorized form in the stdlib)."""
    out = s.str.strip().str.replace(r"\s+", " ", regex=True)
    mask = out.notna()
    out[mask] = out[mask].map(lambda t: unicodedata.normalize("NFC", t))
    return out
