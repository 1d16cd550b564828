"""TSMFESpark — the reference-parity extraction API, Spark-first.

Reference lifecycle (``tsmfe.py``: TSMFE().fit(ts).extract() -> sorted
(name, value) lists, SURVEY §3.1) recast over DataFrames: one call
extracts every requested feature for EVERY conversation series in the
table at once, returning a long result relation instead of Python
lists.

    >>> eng = TSMFESpark(features="all", summaries=("mean", "sd"))
    >>> res = eng.extract(series_df)        # or .extract_turns(turns_df)
    >>> res.columns
    ['conv_id', 'series', 'name', 'value']

``name`` follows the reference naming contract ``feature.summary[.idx]``
(tsmfe.py:427-438), sorted lexicographically per series
(tsmfe.py:941-947).  Scalar features keep their bare name.

Execution: the whole extraction is two Arrow stages —
``groupBy(conv).applyInPandas`` kernels (operators/arrow_kernels.py)
then ``groupBy(conv, feature).applyInPandas`` summaries — so a
1000-executor cluster extracts ~10^6 conversations concurrently with
exactly two shuffles.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ts_pymfe_spark.functions.summaries import DEFAULT_SUMMARIES, summarize
from ts_pymfe_spark.operators.arrow_kernels import (
    FEATURE_KERNELS,
    SEEDED_FEATURE_KERNELS,
    series_features,
)
from ts_pymfe_spark.operators.derive import derive_series


class TSMFESpark:
    """Distributed meta-feature extractor (reference: ``TSMFE``,
    tsmfe.py:44-312).

    Parameters
    ----------
    features : "all" | iterable of names
        Kernel names from operators/arrow_kernels.py (reference ft_*
        counterparts cited there).  Invalid names raise, mirroring the
        reference's group validation (``_internal.py:755-867``).
    summaries : iterable of names
        From functions/summaries.py (32 available; reference default
        ("mean","sd"), tsmfe.py:48).
    max_points : int
        Per-series tail cap (reference test truncation, test_a.py:27).
    """

    def __init__(self, features: str | Iterable[str] = "all",
                 summaries: Iterable[str] = DEFAULT_SUMMARIES,
                 max_points: int = 512) -> None:
        if features == "all":
            self.features = None
        else:
            self.features = list(features)
        self.summaries = tuple(summaries)
        self.max_points = max_points

    def valid_features(self) -> list[str]:
        return sorted(list(FEATURE_KERNELS) + list(SEEDED_FEATURE_KERNELS))

    def extract(self, series_df: DataFrame) -> DataFrame:
        """(conv_id[, series], turn_idx, value) ->
        (conv_id, series, name, value), name sorted lexicographically."""
        feats = series_features(
            series_df, features=self.features, max_points=self.max_points
        )
        summ = summarize(feats, self.summaries)
        name = F.when(F.col("summary") == "", F.col("feature")).otherwise(
            F.concat_ws(".", "feature", "summary")
        )
        # The reference sorts a driver-local Python list (tsmfe.py:941-947);
        # a global orderBy here would be a full extra range-shuffle at
        # 10^6 conversations.  sortWithinPartitions preserves the naming
        # contract per partition with zero exchanges; consumers key by
        # (conv_id, name) anyway.
        return (
            summ.select("conv_id", "series", name.alias("name"), "value")
            .sortWithinPartitions("conv_id", "series", "name")
        )

    def extract_turns(self, turns_df: DataFrame) -> DataFrame:
        """Transcript table (input_hint schema) -> features for every
        derived series (text_len, tool_flag)."""
        return self.extract(derive_series(turns_df))
