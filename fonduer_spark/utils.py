"""General utilities mirroring the reference's public helper surface
(/root/reference/src/fonduer/utils/utils.py and utils_udf.py) — the small
functions user code imports alongside the pipeline API."""

from __future__ import annotations

import re
from typing import Dict, Iterator, List, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def camel_to_under(name: str) -> str:
    """CamelCase -> snake_case (reference utils/utils.py:12-22 — used to
    derive table names from candidate-class names)."""
    s1 = re.sub("(.)([A-Z][a-z]+)", r"\1_\2", name)
    return re.sub("([a-z0-9])([A-Z])", r"\1_\2", s1).lower()


def get_as_dict(x) -> Dict:
    """Object -> dict of attributes (reference utils/utils.py:25-33); Spark
    Rows come back via asDict()."""
    if isinstance(x, dict):
        return x
    for attr in ("asDict", "_asdict"):
        fn = getattr(x, attr, None)
        if fn is not None:
            return fn()
    return x.__dict__


def tokens_to_ngrams(
    tokens: Sequence[str],
    n_min: int = 1,
    n_max: int = 3,
    delim: str = " ",
    lower: bool = False,
) -> Iterator[str]:
    """All n-grams of tokens for n in [n_min, n_max], root-major order
    (reference utils/utils.py:36-48: for each root, grow n) — the iteration
    order LF-helper vocabularies rely on."""
    f = (lambda x: x.lower()) if lower else (lambda x: x)
    N = len(tokens)
    for root in range(N):
        for n in range(max(n_min - 1, 0), min(n_max, N - root)):
            yield f(delim.join(tokens[root:root + n + 1]))


def get_docs_from_split(
    docs: DataFrame, candidates: DataFrame, split: int = 0,
    key: str = "url",
) -> DataFrame:
    """Documents that contain candidates of the given split — the
    reference's per-split doc scan (utils/utils_udf.py:206-220, a subquery
    semi-join on candidate ids) as a left-semi join on the doc key, which
    Catalyst broadcasts when the split's url set is small."""
    urls = candidates.where(F.col("split") == split).select(key).distinct()
    return docs.join(urls, key, "left_semi")
