"""URL-predicate operators: the reference's valid_url / prepare_url as
vectorized pandas UDFs (urls.py semantics need registered-domain
splitting, which has no Column-function equivalent)."""
from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _valid_url_batch(urls):
    from ..kernel.urlutils import valid_url

    return urls.map(lambda u: bool(valid_url(u)) if u is not None else False)


def _prepare_url_batch(urls, sources):
    from ..kernel.urlutils import prepare_url

    return pd.Series(
        [prepare_url(u, s or None) if u else "" for u, s in zip(urls, sources)],
        dtype="object",
    )


valid_url_udf = F.pandas_udf(_valid_url_batch, T.BooleanType())
prepare_url_udf = F.pandas_udf(_prepare_url_batch, T.StringType())
