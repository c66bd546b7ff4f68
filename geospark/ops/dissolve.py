"""Distributed dissolve (unary union by key).

Reference analogue: unary `union` (core.clj:413-417) — here as
groupBy(key).applyInPandas with the arrangement-union kernel per
group.  For cross-key dissolves at scale, union within cells first,
then a second boundary-merge pass (SURVEY.md §2.F mapping).
"""

from __future__ import annotations

from typing import List

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BinaryType, StructField, StructType

from ..geom import core as gc
from ..geom.overlay import union as g_union
from ..geom.core import collection


def dissolve(df: DataFrame, key_col: str, geom_col: str = "geom") -> DataFrame:
    """(key, geom WKB) → one dissolved WKB per key."""
    key_type = df.schema[key_col].dataType
    out_schema = StructType(
        [StructField(key_col, key_type), StructField("geom", BinaryType())]
    )

    def _union_group(pdf: pd.DataFrame) -> pd.DataFrame:
        geoms = [gc.from_wkb(b) for b in pdf[geom_col] if b is not None]
        geoms = [g for g in geoms if not g.is_empty()]
        if not geoms:
            merged = gc.empty(gc.POLYGON)
        elif len(geoms) == 1:
            merged = geoms[0]
        else:
            merged = g_union(collection(geoms))
        return pd.DataFrame(
            {key_col: [pdf[key_col].iloc[0]], "geom": [gc.to_wkb(merged)]}
        )

    return df.select(key_col, geom_col).groupBy(key_col).applyInPandas(
        _union_group, schema=out_schema
    )
