"""Deterministic synthetic Common-Crawl-style pages + district polygons.

The engine's primary input per BASELINE.json `input_hint`:
(url string, warc_ts timestamp, html binary, text string, lang string).

Everything is a pure arithmetic function of (row id, seed) — splitmix64
hashing, no RNG state — so any partitioning yields identical rows and
the extracted text per url is byte-identical across runs/engines
(north-rule per-row invariant).

Spatial distribution is deliberately skewed: a few dense "city" cells
plus a uniform background (FIXTURES.md F1), to exercise hot-cell
salting in the join.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# BNG-ish planar domain (metres)
DOMAIN_X = 700000.0
DOMAIN_Y = 1300000.0

# city centers (easting, northing, weight) — fixed, first is super-hot
CITIES = np.array(
    [
        [530000.0, 180000.0, 8.0],   # london-ish
        [383000.0, 398000.0, 4.0],   # manchester-ish
        [406000.0, 286000.0, 2.0],   # birmingham-ish
        [336000.0, 173000.0, 2.0],   # bristol-ish
        [258000.0, 665000.0, 1.0],   # glasgow-ish
        [424000.0, 565000.0, 1.0],   # newcastle-ish
        [447000.0, 387000.0, 1.0],   # leeds-ish
        [292000.0, 92000.0, 1.0],    # exeter-ish
    ]
)
_CW = CITIES[:, 2] / CITIES[:, 2].sum()
_CDF = np.cumsum(_CW)

LANGS = np.array(["en", "en", "en", "en", "en", "en", "fr", "de", "es", "it"])
WORDS = np.array(
    "the quick brown fox jumps over lazy dog market street river bridge park school church mill lane high road town city council house farm field wood hill green south north east west new old great little upper nether kirk stoke thorpe".split()
)

_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(v: np.ndarray) -> np.ndarray:
    z = (v.astype(np.uint64) + _GAMMA) * np.uint64(1)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _h(ids: np.ndarray, salt: int, seed: int) -> np.ndarray:
    return _splitmix64(ids.astype(np.uint64) ^ np.uint64(seed * 1315423911 + salt))


def _u01(h: np.ndarray) -> np.ndarray:
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def page_coords(ids: np.ndarray, seed: int):
    """Deterministic (x, y, kind) per page id.

    kind: 0 = no geo (25%), 1 = point (70%), 2 = small bbox (5%).
    """
    h0 = _h(ids, 0, seed)
    u_kind = _u01(h0)
    kind = np.where(u_kind < 0.70, 1, np.where(u_kind < 0.75, 2, 0)).astype(np.int8)

    u_city = _u01(_h(ids, 1, seed))
    u_x = _u01(_h(ids, 2, seed))
    u_y = _u01(_h(ids, 3, seed))
    is_city = u_city < 0.8
    ci = np.searchsorted(_CDF, _u01(_h(ids, 4, seed)), side="right").clip(0, len(CITIES) - 1)
    # triangular-ish concentration around the center (sum of 2 uniforms)
    u_x2 = _u01(_h(ids, 5, seed))
    u_y2 = _u01(_h(ids, 6, seed))
    spread = 15000.0
    cx = CITIES[ci, 0] + (u_x + u_x2 - 1.0) * spread
    cy = CITIES[ci, 1] + (u_y + u_y2 - 1.0) * spread
    bx = u_x * DOMAIN_X
    by = u_y * DOMAIN_Y
    x = np.where(is_city, cx, bx)
    y = np.where(is_city, cy, by)
    # keep everything in-domain, 2 decimal places (centimetres)
    x = np.round(np.clip(x, 0.0, DOMAIN_X), 2)
    y = np.round(np.clip(y, 0.0, DOMAIN_Y), 2)
    return x, y, kind


def _build_rows(ids: np.ndarray, seed: int) -> pd.DataFrame:
    n = len(ids)
    x, y, kind = page_coords(ids, seed)
    lang = LANGS[(_h(ids, 7, seed) % np.uint64(len(LANGS))).astype(np.int64)]
    nw = 5 + (_h(ids, 8, seed) % np.uint64(12)).astype(np.int64)
    w1 = WORDS[(_h(ids, 9, seed) % np.uint64(len(WORDS))).astype(np.int64)]
    w2 = WORDS[(_h(ids, 10, seed) % np.uint64(len(WORDS))).astype(np.int64)]
    w3 = WORDS[(_h(ids, 11, seed) % np.uint64(len(WORDS))).astype(np.int64)]

    ts = pd.to_datetime(
        1490000000 + (ids.astype(np.int64) % 86400) * 37 + ids.astype(np.int64) // 86400,
        unit="s",
    )
    half = 150.0
    sid = ids.astype(np.int64)
    urls = np.char.add(
        np.char.add("https://site", (sid % 997).astype(str)),
        np.char.add(".example.org/page/", sid.astype(str)),
    )
    base = np.char.add(np.char.add(np.char.add(np.char.add(w1, " "), w2), " "), np.char.add(w3, " "))
    reps = (nw // 3 + 1).astype(np.int64)
    body = np.char.rstrip(np.strings.multiply(base, reps) if hasattr(np, "strings") else np.char.multiply(base, reps))
    f2 = lambda a: np.char.mod("%.2f", a)
    geo_pt = np.char.add(np.char.add(np.char.add("geo:", f2(x)), ","), f2(y))
    geo_bb = np.char.add(
        np.char.add(
            np.char.add(np.char.add(np.char.add("bbox:", f2(np.maximum(0.0, x - half))), ","), f2(np.maximum(0.0, y - half))),
            ",",
        ),
        np.char.add(np.char.add(f2(x + half), ","), f2(y + half)),
    )
    suffix = np.where(kind == 1, np.char.add(" ", geo_pt), np.where(kind == 2, np.char.add(" ", geo_bb), ""))
    text = np.char.add(body, suffix)
    html = np.char.add(
        np.char.add(
            np.char.add(np.char.add("<html><head><title>p", sid.astype(str)), "</title></head><body><p>"),
            text,
        ),
        "</p></body></html>",
    )
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts,
            "html": [h.encode("utf-8") for h in html],
            "text": text,
            "lang": lang,
            "page_id": sid,
        }
    )


PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("page_id", LongType()),
    ]
)


def generate_pages(spark: SparkSession, n: int, seed: int = 42, partitions: int = 0) -> DataFrame:
    """Distributed deterministic pages table."""
    base = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _build_rows(pdf["id"].to_numpy(), seed)

    return base.mapInPandas(gen, schema=PAGES_SCHEMA)


# ---------------------------------------------------------------------------
# districts (join build side, FIXTURES.md F2)
# ---------------------------------------------------------------------------

def generate_districts(spark: SparkSession, n: int, seed: int = 43) -> DataFrame:
    """Deterministic district polygons: squares, circles, rectangles,
    concentrated around the cities plus a background grid."""
    from ..geom import core as gcore
    from ..geom.buffer import buffer as gbuffer

    ids = np.arange(n, dtype=np.uint64)
    u_city = _u01(_h(ids, 20, seed))
    ci = np.searchsorted(_CDF, _u01(_h(ids, 21, seed)), side="right").clip(0, len(CITIES) - 1)
    is_city = u_city < 0.6
    ux = _u01(_h(ids, 22, seed))
    uy = _u01(_h(ids, 23, seed))
    cxs = np.where(is_city, CITIES[ci, 0] + (ux - 0.5) * 30000.0, ux * DOMAIN_X)
    cys = np.where(is_city, CITIES[ci, 1] + (uy - 0.5) * 30000.0, uy * DOMAIN_Y)
    # administrative-boundary-like sizing: districts mostly tile space
    # (real districts rarely overlap) — the hot-cell skew comes from
    # the page distribution, not from stacking polygons
    size = 250.0 + _u01(_h(ids, 24, seed)) * 1250.0
    shape = (_h(ids, 25, seed) % np.uint64(4)).astype(np.int64)

    rows = []
    for i in range(n):
        x0, y0, s = float(cxs[i]), float(cys[i]), float(size[i])
        if shape[i] == 0:  # square
            g = gcore.polygon(
                [[x0 - s, y0 - s], [x0 + s, y0 - s], [x0 + s, y0 + s], [x0 - s, y0 + s], [x0 - s, y0 - s]]
            )
        elif shape[i] == 1:  # circle (buffered point, testutils.clj:23-27)
            g = gbuffer(gcore.point(x0, y0), s, 4)
        elif shape[i] == 2:  # wide rectangle
            g = gcore.polygon(
                [[x0 - 2 * s, y0 - s / 2], [x0 + 2 * s, y0 - s / 2], [x0 + 2 * s, y0 + s / 2], [x0 - 2 * s, y0 + s / 2], [x0 - 2 * s, y0 - s / 2]]
            )
        else:  # square with a hole
            g = gcore.polygon(
                [[x0 - s, y0 - s], [x0 + s, y0 - s], [x0 + s, y0 + s], [x0 - s, y0 + s], [x0 - s, y0 - s]],
                holes=[[[x0 - s / 3, y0 - s / 3], [x0 + s / 3, y0 - s / 3], [x0 + s / 3, y0 + s / 3], [x0 - s / 3, y0 + s / 3], [x0 - s / 3, y0 - s / 3]]],
            )
        rows.append((int(ids[i]), f"district_{int(ids[i])}", gcore.to_wkb(g), 27700))
    pdf = pd.DataFrame(rows, columns=["poly_id", "name", "geom", "srid"])
    return spark.createDataFrame(pdf)
