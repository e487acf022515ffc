"""EP1 — the flagship encode pipeline (SURVEY.md §3):

features --assign_tiles--> explode --[salt]--> groupBy(z,x,y[,salt])
  --applyInPandas(quantize -> clip -> simplify -> encode)--> layer blobs
  --groupBy(z,x,y)--> tile blobs

This inverts the reference's per-tile datasource probe
(processor::update_tile looping ds->features(query)) into ONE shuffle
keyed on tile address — J1 inversion. Stage order inside the UDF
(transform -> clip -> simplify -> encode) preserves
vector_tile_processor.ipp create_geom_layer's visitor order.

Scale notes (the 100TB story):
* assign_tiles is a narrow 1->N flatmap in Arrow batches — no shuffle;
* the groupBy is THE shuffle; low-z tiles are planet-sized hot keys, so
  z <= SALT_MAX_Z groups are salted into 4^(SALT_MAX_Z-z) sub-groups
  encoded as partial layers and merged in a second, much smaller
  groupBy (two-phase aggregation — SURVEY.md §4.3);
* all geometry kernels run vectorized numpy inside the Arrow batch;
  per-feature Python is bounded by features-per-tile, not table size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapnik_vector_tile_spark.functions import clip as clipmod
from mapnik_vector_tile_spark.functions import geomcodec as gc
from mapnik_vector_tile_spark.functions import pbf
from mapnik_vector_tile_spark.functions import pip as pipmod
from mapnik_vector_tile_spark.functions import simplify as simp
from mapnik_vector_tile_spark.functions import tilemath as tm
from mapnik_vector_tile_spark.sources.synth import footprint_from_phash

FEATURES_SCHEMA = (
    "feature_id long, geom_type int, xs array<double>, ys array<double>, "
    "part_offsets array<int>, caption string"
)


def images_to_features(images: DataFrame) -> DataFrame:
    """input_hint images -> canonical features: point footprint + quad
    polygon derived from phash (FIXTURES.md §1). Vectorized pandas UDF;
    bytes column never touched (column pruning keeps it out of Arrow).
    """

    def gen(it):
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            ph = pdf["phash"].to_numpy()
            idx = pdf["image_id"].str.slice(4).astype(np.int64).to_numpy()
            lon, lat, hw = footprint_from_phash(ph, idx)
            mx, my = tm.lonlat_to_merc_np(lon, lat)
            # footprint quad in mercator: half-width in degrees scaled
            hwm = hw * 111319.49079327358
            # one point feature + one quad polygon feature per image
            pt = pd.DataFrame(
                {
                    "feature_id": idx * 2,
                    "geom_type": gc.GEOM_POINT,
                    "xs": [[x] for x in mx],
                    "ys": [[y] for y in my],
                    "part_offsets": [[0, 1]] * n,
                    "caption": pdf["caption"].to_numpy(),
                }
            )
            quad = pd.DataFrame(
                {
                    "feature_id": idx * 2 + 1,
                    "geom_type": gc.GEOM_POLYGON,
                    # wound CW in mercator y-up so the y-flip at
                    # quantization yields MVT-positive exterior area
                    "xs": [
                        [x - w, x - w, x + w, x + w]
                        for x, w in zip(mx, hwm)
                    ],
                    "ys": [
                        [y - w, y + w, y + w, y - w]
                        for y, w in zip(my, hwm)
                    ],
                    "part_offsets": [[0, 4]] * n,
                    "caption": pdf["caption"].to_numpy(),
                }
            )
            yield pd.concat([pt, quad])

    cols = ["image_id", "phash", "caption"]
    return images.select(*cols).mapInPandas(gen, schema=FEATURES_SCHEMA)


def assign_tiles(
    features: DataFrame,
    z_min: int = 0,
    z_max: int = 14,
    buffer_units: int = tm.DEFAULT_BUFFER,
) -> DataFrame:
    """1->N covering-tile fan-out (A.2) over the z range — fully
    vectorized (np.repeat cartesian enumeration, no per-feature Python
    loop): the hot narrow stage before THE shuffle."""

    def gen(it):
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            minxs = pdf["xs"].map(min).to_numpy(dtype=np.float64)
            maxxs = pdf["xs"].map(max).to_numpy(dtype=np.float64)
            minys = pdf["ys"].map(min).to_numpy(dtype=np.float64)
            maxys = pdf["ys"].map(max).to_numpy(dtype=np.float64)
            chunks = []
            for z in range(z_min, z_max + 1):
                lox, hix, loy, hiy = tm.covering_tiles_np(
                    minxs, minys, maxxs, maxys, z, buffer_units
                )
                nx = hix - lox + 1
                ny = hiy - loy + 1
                cnt = nx * ny
                rep = np.repeat(np.arange(n), cnt)
                # within-feature rank 0..cnt-1 -> (dx, dy) cartesian
                starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
                rank = np.arange(int(cnt.sum())) - np.repeat(starts, cnt)
                tx = lox[rep] + rank // ny[rep]
                ty = loy[rep] + rank % ny[rep]
                out = pdf.iloc[rep].reset_index(drop=True)
                out["z"] = np.full(len(rep), z, dtype=np.int32)
                out["x"] = tx
                out["y"] = ty
                chunks.append(out)
            yield pd.concat(chunks)

    schema = FEATURES_SCHEMA + ", z int, x long, y long"
    return features.mapInPandas(gen, schema=schema)


SALT_MAX_Z = 5  # tiles at z <= this get salted two-phase encoding


def with_salt(assigned: DataFrame, n_salts: int = 16) -> DataFrame:
    """Hot-key mitigation: low-z groups split by a feature_id-derived
    salt; high-z groups use salt 0. Deterministic (no rand()) so resume
    and golden tests stay stable."""
    return assigned.withColumn(
        "salt",
        F.when(
            F.col("z") <= SALT_MAX_Z,
            (F.col("feature_id") % n_salts).cast("int"),
        ).otherwise(F.lit(0)),
    )


def encode_layers(
    assigned: DataFrame,
    layer_name: str = "features",
    extent: int = tm.DEFAULT_EXTENT,
    buffer_units: int = tm.DEFAULT_BUFFER,
    simplify_distance: float = 0.0,
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(z,x,y,salt).applyInPandas: quantize (A.3) -> clip in
    world coords (F10-F12) -> simplify (F9, tile units) -> command
    stream (F4-F8) -> Layer blob (A1-A3 dictionaries).

    Returns one row per (z,x,y,salt): partial layer blobs + counts.
    Salted partials are merged by merge_salted_layers.
    """

    def encode_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        z, x, y, _salt = (int(k) for k in key)
        span = tm.tile_span(z)
        minx = -tm.W + x * span
        maxy = tm.W - y * span
        buf_m = span * buffer_units / extent
        bx0, by0 = minx - buf_m, (maxy - span) - buf_m
        bx1, by1 = minx + span + buf_m, maxy + buf_m
        scale = extent / span

        lb = pbf.LayerBuilder(layer_name, extent=extent)
        n_pts = 0
        # deterministic encode order (W1): stable sort by feature_id
        pdf = pdf.sort_values("feature_id", kind="mergesort")
        for fid, gtype, xs, ys, offs, caption in zip(
            pdf["feature_id"],
            pdf["geom_type"],
            pdf["xs"],
            pdf["ys"],
            pdf["part_offsets"],
            pdf["caption"],
        ):
            xs = np.asarray(xs, dtype=np.float64)
            ys = np.asarray(ys, dtype=np.float64)
            offs = np.asarray(offs, dtype=np.int64)
            if gtype == gc.GEOM_POINT:
                cx, cy = clipmod.clip_points(xs, ys, bx0, by0, bx1, by1)
                if len(cx) == 0:
                    continue
                px = tm.round_half_away_np((cx - minx) * scale)
                py = tm.round_half_away_np((maxy - cy) * scale)
                px, py = _dedup_pairs(px, py)
                stream = gc.encode_geometry(
                    gc.GEOM_POINT, px, py, np.array([0, len(px)])
                )
            elif gtype == gc.GEOM_LINESTRING:
                parts = []
                for p in range(len(offs) - 1):
                    parts.extend(
                        clipmod.clip_line(
                            xs[offs[p] : offs[p + 1]],
                            ys[offs[p] : offs[p + 1]],
                            bx0,
                            by0,
                            bx1,
                            by1,
                        )
                    )
                if not parts:
                    continue
                fx = np.concatenate([p[0] for p in parts])
                fy = np.concatenate([p[1] for p in parts])
                poffs = np.cumsum([0] + [len(p[0]) for p in parts])
                px = tm.round_half_away_np((fx - minx) * scale)
                py = tm.round_half_away_np((maxy - fy) * scale)
                if simplify_distance > 0:
                    px, py, poffs = simp.simplify_rings(
                        px, py, poffs, simplify_distance, closed=False
                    )
                stream = gc.encode_geometry(gc.GEOM_LINESTRING, px, py, poffs)
            elif gtype == gc.GEOM_POLYGON:
                fx, fy, roffs = clipmod.clip_polygon(
                    xs, ys, offs, bx0, by0, bx1, by1
                )
                if len(fx) == 0:
                    continue
                px = tm.round_half_away_np((fx - minx) * scale)
                py = tm.round_half_away_np((maxy - fy) * scale)
                # wagyu-parity winding repair in tile coords (even-odd
                # containment depth -> exterior positive, hole negative)
                px, py = pipmod.normalize_ring_winding(
                    px, py, roffs, gc.signed_area2
                )
                if simplify_distance > 0:
                    px, py, roffs = simp.simplify_rings(
                        px, py, roffs, simplify_distance, closed=True
                    )
                stream = gc.encode_geometry(gc.GEOM_POLYGON, px, py, roffs)
            else:
                continue
            if len(stream) == 0:
                continue
            lb.add_feature(int(fid), int(gtype), stream, {"caption": caption})
            n_pts += len(xs)
        if not lb.painted:
            return pd.DataFrame(
                columns=["z", "x", "y", "layer", "blob", "n_features", "n_points"]
            ).astype(
                {
                    "z": "int32",
                    "x": "int64",
                    "y": "int64",
                    "layer": "object",
                    "blob": "object",
                    "n_features": "int64",
                    "n_points": "int64",
                }
            )
        return pd.DataFrame(
            {
                "z": np.array([z], dtype=np.int32),
                "x": np.array([x], dtype=np.int64),
                "y": np.array([y], dtype=np.int64),
                "layer": [layer_name],
                "blob": [lb.build()],
                "n_features": np.array([len(lb._features)], dtype=np.int64),
                "n_points": np.array([n_pts], dtype=np.int64),
            }
        )

    salted = with_salt(assigned, n_salts=n_salts)
    partials = salted.groupBy("z", "x", "y", "salt").applyInPandas(
        encode_group,
        schema=(
            "z int, x long, y long, layer string, blob binary, "
            "n_features long, n_points long"
        ),
    )
    return merge_salted_layers(partials)


def _dedup_pairs(px: np.ndarray, py: np.ndarray):
    """Distinct quantized points for multipoint encode, order-preserving."""
    if len(px) <= 1:
        return px, py
    seen = {}
    keep = []
    for i in range(len(px)):
        k = (int(px[i]), int(py[i]))
        if k not in seen:
            seen[k] = True
            keep.append(i)
    keep = np.array(keep, dtype=np.int64)
    return px[keep], py[keep]


def merge_salted_layers(partials: DataFrame) -> DataFrame:
    """Second-phase fold: merge partial layer blobs for the same
    (z,x,y,layer). The merge re-maps tag indices into a fresh combined
    dictionary (the 'genuinely novel kernel' of SURVEY.md §4.3) —
    features keep encode order by salt then feature order."""

    def merge_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        z, x, y, layer = key
        blobs = pdf["blob"].tolist()
        if len(blobs) == 1:
            out_blob = blobs[0]
        else:
            decoded = [pbf.decode_layer(b) for b in blobs]
            lb = pbf.LayerBuilder(str(layer), extent=decoded[0]["extent"])
            feats = []
            for d in decoded:
                for f in d["features"]:
                    feats.append((f, d))
            feats.sort(key=lambda fd: fd[0]["id"])
            for f, d in feats:
                lb.add_feature(
                    f["id"], f["type"], f["geometry"], pbf.feature_props(d, f)
                )
            out_blob = lb.build()
        return pd.DataFrame(
            {
                "z": np.array([z], dtype=np.int32),
                "x": np.array([x], dtype=np.int64),
                "y": np.array([y], dtype=np.int64),
                "layer": [str(layer)],
                "blob": [out_blob],
                "n_features": np.array([int(pdf["n_features"].sum())], dtype=np.int64),
                "n_points": np.array([int(pdf["n_points"].sum())], dtype=np.int64),
            }
        )

    return partials.groupBy("z", "x", "y", "layer").applyInPandas(
        merge_group,
        schema=(
            "z int, x long, y long, layer string, blob binary, "
            "n_features long, n_points long"
        ),
    )


def fold_tiles(layers: DataFrame) -> DataFrame:
    """A4 final fold: (z,x,y) -> one Tile buffer. Deterministic layer
    order via sort; Tile message legality per A.5 (field-3 concat)."""

    def concat_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        z, x, y = (int(k) for k in key)
        pdf = pdf.sort_values("layer", kind="mergesort")
        tile = pbf.concat_tile(pdf["blob"].tolist())
        return pd.DataFrame(
            {
                "z": np.array([z], dtype=np.int32),
                "x": np.array([x], dtype=np.int64),
                "y": np.array([y], dtype=np.int64),
                "tile": [tile],
                "n_layers": np.array([len(pdf)], dtype=np.int64),
                "n_features": np.array([int(pdf["n_features"].sum())], dtype=np.int64),
            }
        )

    return layers.groupBy("z", "x", "y").applyInPandas(
        concat_group,
        schema="z int, x long, y long, tile binary, n_layers long, n_features long",
    )


def decode_tiles_to_features(tiles: DataFrame) -> DataFrame:
    """S2/EP2: tiles table -> features rows (lazy per-layer decode in a
    narrow mapInPandas — no shuffle)."""

    def gen(it):
        for pdf in it:
            rows = {
                "z": [],
                "x": [],
                "y": [],
                "layer": [],
                "feature_id": [],
                "geom_type": [],
                "pxs": [],
                "pys": [],
                "part_offsets": [],
                "caption": [],
            }
            for z, x, y, tile in zip(pdf["z"], pdf["x"], pdf["y"], pdf["tile"]):
                for lmsg in pbf.decode_tile(pbf.maybe_decompress(bytes(tile))):
                    layer = pbf.decode_layer(lmsg)
                    for f in layer["features"]:
                        xs, ys, offs = gc.decode_geometry(
                            int(f["type"]), f["geometry"].astype(np.int64)
                        )
                        props = pbf.feature_props(layer, f)
                        rows["z"].append(int(z))
                        rows["x"].append(int(x))
                        rows["y"].append(int(y))
                        rows["layer"].append(layer["name"])
                        rows["feature_id"].append(int(f["id"]))
                        rows["geom_type"].append(int(f["type"]))
                        rows["pxs"].append(xs.tolist())
                        rows["pys"].append(ys.tolist())
                        rows["part_offsets"].append(offs.tolist())
                        rows["caption"].append(props.get("caption"))
            yield pd.DataFrame(rows)

    schema = (
        "z int, x long, y long, layer string, feature_id long, geom_type int, "
        "pxs array<long>, pys array<long>, part_offsets array<long>, caption string"
    )
    return tiles.mapInPandas(gen, schema=schema)
