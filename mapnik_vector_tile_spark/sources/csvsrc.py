"""CSV datasource — S1 source parity widening (SURVEY.md §2.1). The
reference's mapnik layer ingests delimited text through its csv
plugin (public mapnik: plugins/input/csv — csv_datasource), which
accepts either lon/lat numeric columns or a WKT geometry column and
drops unparsable rows while scanning on. This module is the
Spark-native equivalent: ``spark.read.csv`` does the scanning
(header inference off — the schema is explicit, so the scan prunes
columns and parallelizes by file split like any other Spark text
source), and a narrow vectorized stage shapes the rows into the
canonical ``operators.tiling.FEATURES_SCHEMA``.

Point mode is fully vectorized (pandas to_numeric over the Arrow
batch + the shared numpy lonlat→merc transform — no per-row Python);
WKT mode delegates to sources.wkt so the two text datasources share
one parser and one drop policy. Rows with unparsable coordinates,
non-finite values, latitudes beyond ±90, or null ids DROP (the
reference's strict=false default: log-and-continue), never the task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from mapnik_vector_tile_spark.functions import geomcodec as gc
from mapnik_vector_tile_spark.functions import tilemath as tm


def csv_to_features(
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    wkt_col: str | None = None,
    id_col: str = "id",
    caption_col: str | None = "caption",
    to_merc: bool = True,
) -> DataFrame:
    """Shape a parsed CSV DataFrame (string columns, as spark.read.csv
    yields them) into the features schema. ``wkt_col`` switches to the
    WKT-geometry mode (mapnik csv's other accepted layout)."""
    if wkt_col is not None:
        from mapnik_vector_tile_spark.sources.wkt import wkt_to_features

        return wkt_to_features(
            df, wkt_col=wkt_col, id_col=id_col,
            caption_col=caption_col or "caption", to_merc=to_merc,
        )

    def gen(batches):
        for pdf in batches:
            lon = pd.to_numeric(pdf[lon_col], errors="coerce").to_numpy(
                np.float64
            )
            lat = pd.to_numeric(pdf[lat_col], errors="coerce").to_numpy(
                np.float64
            )
            fid = pd.to_numeric(pdf[id_col], errors="coerce")
            # integral-id rule without a float64 detour (floats silently
            # corrupt ids beyond 2^53): non-integral or NaN ids drop
            ok = (
                np.isfinite(lon)
                & np.isfinite(lat)
                & (np.abs(lat) <= 90.0)
                & (np.abs(lon) <= 180.0)
                & fid.notna().to_numpy()
                & (fid % 1 == 0).fillna(False).to_numpy()
            )
            if not ok.any():
                continue
            lon, lat = lon[ok], lat[ok]
            # re-parse the SURVIVING id strings: all-integral input
            # gives pandas an exact int64 dtype (no 2^53 rounding)
            fids = pd.to_numeric(
                pdf[id_col][ok].astype(str).str.strip(), errors="coerce"
            )
            if fids.dtype != np.int64:
                fids = fids.astype(np.int64)
            fids = fids.to_numpy()
            if caption_col is not None and caption_col in pdf:
                caps = (
                    pdf[caption_col]
                    .where(pdf[caption_col].notna(), "")
                    .astype(str)
                    .to_numpy()[ok]
                )
            else:
                caps = np.full(len(fids), "", dtype=object)
            if to_merc:
                xs, ys = tm.lonlat_to_merc_np(lon, lat)
            else:
                xs, ys = lon, lat
            yield pd.DataFrame(
                {
                    "feature_id": fids,
                    "geom_type": np.full(len(fids), gc.GEOM_POINT, np.int32),
                    "xs": [[v] for v in xs],
                    "ys": [[v] for v in ys],
                    "part_offsets": [[0, 1]] * len(fids),
                    "caption": caps,
                }
            )

    from mapnik_vector_tile_spark.operators.tiling import FEATURES_SCHEMA

    return df.mapInPandas(gen, schema=FEATURES_SCHEMA)


def read_csv_features(
    spark: SparkSession,
    path: str,
    columns: list[str],
    lon_col: str = "lon",
    lat_col: str = "lat",
    wkt_col: str | None = None,
    id_col: str = "id",
    caption_col: str | None = "caption",
    to_merc: bool = True,
    header: bool = True,
) -> DataFrame:
    """CSV file/directory datasource → features schema. ``columns``
    pins the layout explicitly (all read as strings; the shaping stage
    owns coercion + the drop policy), so the scan never pays schema
    inference and Catalyst prunes unreferenced columns."""
    schema = ", ".join(f"`{c}` string" for c in columns)
    raw = spark.read.csv(path, schema=schema, header=header)
    return csv_to_features(
        raw, lon_col, lat_col, wkt_col, id_col, caption_col, to_merc
    )
