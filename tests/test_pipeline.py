"""EP1 end-to-end: images -> features -> covering tiles -> encoded
layers -> folded tiles -> decode (EP2) with parity invariants:
tile-assignment parity, caption equality through the whole pipeline,
quantized coords within the buffered extent (north_star contract)."""

import numpy as np
import pytest

from mapnik_vector_tile_spark.functions import geomcodec as gc
from mapnik_vector_tile_spark.functions import tilemath as tm
from mapnik_vector_tile_spark.operators import tiling as T
from mapnik_vector_tile_spark.sources import synth

N_IMAGES = 120
Z_MIN, Z_MAX = 0, 8


@pytest.fixture(scope="module")
def tiles_and_features(spark):
    images = synth.images_df(spark, N_IMAGES, with_bytes=False, slices=4)
    feats = T.images_to_features(images)
    assigned = T.assign_tiles(feats, Z_MIN, Z_MAX)
    layers = T.encode_layers(assigned, n_salts=4)
    tiles = T.fold_tiles(layers).cache()
    decoded = T.decode_tiles_to_features(tiles).cache()
    return tiles.toPandas(), decoded.toPandas()


def test_tile_assignment_parity(tiles_and_features):
    """Every z in range present; point features land in the tile A.2
    math predicts (checked independently of the pipeline)."""
    tiles, decoded = tiles_and_features
    assert set(tiles["z"].unique()) == set(range(Z_MIN, Z_MAX + 1))
    i = np.arange(N_IMAGES, dtype=np.int64)
    ph = synth.phash_for_index(i)
    lon, lat, _ = synth.footprint_from_phash(ph, i)
    mx, my = tm.lonlat_to_merc_np(lon, lat)
    for z in (0, 4, Z_MAX):
        tx, ty = tm.point_tile_np(mx, my, z)
        got = decoded[
            (decoded.z == z) & (decoded.geom_type == gc.GEOM_POINT)
        ]
        # each point feature_id 2i must appear in tile (tx[i], ty[i])
        # (it may ALSO appear in buffer zones of neighbors)
        by_fid = got.groupby("feature_id")
        for k in range(N_IMAGES):
            fid = 2 * k
            assert fid in by_fid.groups, f"point {fid} missing at z{z}"
            rows = by_fid.get_group(fid)
            assert ((rows.x == tx[k]) & (rows.y == ty[k])).any()


def test_caption_equality_through_pipeline(tiles_and_features):
    _, decoded = tiles_and_features
    images = synth.gen_images_pdf(N_IMAGES, with_bytes=False)
    cap = dict(zip((np.arange(N_IMAGES) * 2).tolist(), images["caption"]))
    cap.update(dict(zip((np.arange(N_IMAGES) * 2 + 1).tolist(), images["caption"])))
    assert len(decoded) > 0
    for fid, c in zip(decoded.feature_id, decoded.caption):
        assert cap[int(fid)] == c


def test_coords_within_buffered_extent(tiles_and_features):
    _, decoded = tiles_and_features
    lo = -tm.DEFAULT_BUFFER
    hi = tm.DEFAULT_EXTENT + tm.DEFAULT_BUFFER
    for pxs, pys in zip(decoded.pxs, decoded.pys):
        assert min(pxs) >= lo and max(pxs) <= hi
        assert min(pys) >= lo and max(pys) <= hi


def test_polygon_winding_valid(tiles_and_features):
    _, decoded = tiles_and_features
    polys = decoded[decoded.geom_type == gc.GEOM_POLYGON]
    assert len(polys) > 0
    n_checked = 0
    for pxs, pys, offs in zip(polys.pxs, polys.pys, polys.part_offsets):
        xs = np.array(pxs, dtype=np.int64)
        ys = np.array(pys, dtype=np.int64)
        offs = np.array(offs, dtype=np.int64)
        # first ring of each feature must be exterior (positive)
        a2 = gc.signed_area2(xs[offs[0] : offs[1]], ys[offs[0] : offs[1]])
        assert a2 > 0
        n_checked += 1
    assert n_checked > 0


def test_salted_low_z_equals_unsalted(spark):
    """Two-phase salted encode must produce byte-identical tiles to the
    unsalted path (dictionary re-map correctness)."""
    images = synth.images_df(spark, 40, with_bytes=False, slices=2)
    feats = T.images_to_features(images)
    assigned = T.assign_tiles(feats, 0, 3)
    t_salted = (
        T.fold_tiles(T.encode_layers(assigned, n_salts=8)).toPandas()
        .sort_values(["z", "x", "y"]).reset_index(drop=True)
    )
    t_plain = (
        T.fold_tiles(T.encode_layers(assigned, n_salts=1)).toPandas()
        .sort_values(["z", "x", "y"]).reset_index(drop=True)
    )
    assert len(t_salted) == len(t_plain)
    for a, b in zip(t_salted.itertuples(), t_plain.itertuples()):
        assert (a.z, a.x, a.y) == (b.z, b.x, b.y)
        assert a.n_features == b.n_features
        assert bytes(a.tile) == bytes(b.tile), f"tile {a.z}/{a.x}/{a.y} differs"


def test_fused_encode_tiles_byte_identical(spark):
    """encode_tiles (salted low-z merge+fold, inline-folded unsalted
    high-z) must be byte-identical to the two-stage
    fold_tiles(encode_layers(...)) path; z range spans BOTH branches
    of the split."""
    images = synth.images_df(spark, 50, with_bytes=False, slices=2)
    feats = T.images_to_features(images)
    assigned = T.assign_tiles(feats, 0, 7)
    fused = (
        T.encode_tiles(assigned, n_salts=8).toPandas()
        .sort_values(["z", "x", "y"]).reset_index(drop=True)
    )
    staged = (
        T.fold_tiles(T.encode_layers(assigned, n_salts=8)).toPandas()
        .sort_values(["z", "x", "y"]).reset_index(drop=True)
    )
    assert len(fused) == len(staged) > 0
    for a, b in zip(fused.itertuples(), staged.itertuples()):
        assert (a.z, a.x, a.y) == (b.z, b.x, b.y)
        assert (a.n_layers, a.n_features) == (b.n_layers, b.n_features)
        assert bytes(a.tile) == bytes(b.tile), f"tile {a.z}/{a.x}/{a.y} differs"


def test_encode_tiles_from_features_byte_identical(spark):
    """The split-z-range single-enumeration path must be
    byte-identical to encode_tiles(assign_tiles(...)) across a z
    range spanning both branches, and for a purely-high-z range
    (where the lo branch is skipped entirely)."""
    images = synth.images_df(spark, 50, with_bytes=False, slices=2)
    feats = T.images_to_features(images)
    for z0, z1 in ((0, 7), (6, 8)):
        ref = (
            T.encode_tiles(T.assign_tiles(feats, z0, z1), n_salts=8)
            .toPandas().sort_values(["z", "x", "y"]).reset_index(drop=True)
        )
        new = (
            T.encode_tiles_from_features(feats, z0, z1, n_salts=8)
            .toPandas().sort_values(["z", "x", "y"]).reset_index(drop=True)
        )
        assert len(ref) == len(new) > 0
        for a, b in zip(ref.itertuples(), new.itertuples()):
            assert (a.z, a.x, a.y) == (b.z, b.x, b.y)
            assert bytes(a.tile) == bytes(b.tile), (z0, z1, a.z, a.x, a.y)


def test_encode_tiles_from_features_adaptive_salt(spark):
    """Adaptive salting can split hot groups at ANY zoom, so the
    split-z-range fast path (whose hi branch inline-folds with
    emit_tiles=True) must NOT be taken: each salted partial would be
    emitted as a finished tile — duplicate (z,x,y) rows.  Adaptive
    mode must route the whole range through merge+fold and stay
    byte-identical to encode_tiles."""
    images = synth.images_df(spark, 120, with_bytes=False, slices=2)
    feats = T.images_to_features(images)
    new = (
        T.encode_tiles_from_features(feats, 0, 7, adaptive_salt_target=5)
        .toPandas().sort_values(["z", "x", "y"]).reset_index(drop=True)
    )
    # no duplicate tile keys (the bug symptom)
    keys = list(map(tuple, new[["z", "x", "y"]].values))
    assert len(keys) == len(set(keys))
    ref = (
        T.encode_tiles(T.assign_tiles(feats, 0, 7), adaptive_salt_target=5)
        .toPandas().sort_values(["z", "x", "y"]).reset_index(drop=True)
    )
    assert len(ref) == len(new) > 0
    for a, b in zip(ref.itertuples(), new.itertuples()):
        assert (a.z, a.x, a.y) == (b.z, b.x, b.y)
        assert bytes(a.tile) == bytes(b.tile), (a.z, a.x, a.y)


def test_decode_bbox_prefilter(spark):
    """S2 decode-scan bbox: tile-id pruning before decode equals full
    decode + post-filter on tile intersection."""
    images = synth.images_df(spark, 80, with_bytes=False, slices=2)
    feats = T.images_to_features(images)
    tiles = T.fold_tiles(T.encode_layers(T.assign_tiles(feats, 3, 6))).cache()
    bbox = (-tm.W, 0.0, 0.0, tm.W)  # NW world quadrant
    pruned = T.decode_tiles_to_features(tiles, bbox=bbox).toPandas()
    full = T.decode_tiles_to_features(tiles).toPandas()
    # oracle: tiles whose merc extent intersects bbox
    keep = []
    for r in full.itertuples():
        span = 2 * tm.W / (1 << r.z)
        minx = -tm.W + r.x * span
        maxy = tm.W - r.y * span
        keep.append(
            minx <= bbox[2] and minx + span >= bbox[0]
            and maxy - span <= bbox[3] and maxy >= bbox[1]
        )
    expect = full[np.array(keep)]
    assert len(pruned) == len(expect)
    assert set(map(tuple, pruned[["z", "x", "y", "feature_id"]].values)) == set(
        map(tuple, expect[["z", "x", "y", "feature_id"]].values)
    )


def test_adaptive_salt_equals_unsalted(spark):
    """Adaptive cell splitting (density-driven salt counts) must also
    reproduce byte-identical tiles — same splice-merge invariant as the
    fixed-salt path, plus: hot tiles actually split."""
    images = synth.images_df(spark, 300, with_bytes=False, slices=4)
    feats = T.images_to_features(images)
    assigned = T.assign_tiles(feats, 0, 4)
    t_adaptive = (
        T.fold_tiles(
            T.encode_layers(assigned, adaptive_salt_target=50)
        )
        .toPandas()
        .sort_values(["z", "x", "y"])
        .reset_index(drop=True)
    )
    t_plain = (
        T.fold_tiles(T.encode_layers(assigned, n_salts=1))
        .toPandas()
        .sort_values(["z", "x", "y"])
        .reset_index(drop=True)
    )
    assert len(t_adaptive) == len(t_plain)
    for a, b in zip(t_adaptive.itertuples(), t_plain.itertuples()):
        assert (a.z, a.x, a.y) == (b.z, b.x, b.y)
        assert bytes(a.tile) == bytes(b.tile)
    # the z0 tile (600 features > target 50) must have been salted:
    salted = T.with_adaptive_salt(assigned, target_group_rows=50)
    z0_salts = (
        salted.filter("z = 0").select("salt").distinct().count()
    )
    assert z0_salts > 1


def test_pack_coords_roundtrip():
    """_pack_coords/_unpack_coords: exact float64/int64 round trip for
    arbitrary part shapes (the shuffle wire format for multi-vertex
    geometry)."""
    import numpy as np

    from mapnik_vector_tile_spark.operators.tiling import (
        _pack_coords,
        _unpack_coords,
    )

    rng = np.random.default_rng(3)
    for n, m in [(1, 2), (4, 2), (23, 4), (1000, 11)]:
        xs = rng.uniform(-2e7, 2e7, n)
        ys = rng.uniform(-2e7, 2e7, n)
        offs = np.sort(rng.integers(0, n + 1, m))
        bx, by, bo = _unpack_coords(_pack_coords(xs, ys, offs))
        assert (bx == xs).all() and (by == ys).all() and (bo == offs).all()


def test_area_threshold_drops_small_rings(spark):
    """Reference processor option area_threshold (tile-unit ring area,
    src/vector_tile_geometry_clipper.hpp): a tiny interior ring is
    dropped at threshold>area while the exterior survives; threshold=0
    keeps both."""
    z = 2
    span = tm.tile_span(z)
    minx = -tm.W + 1 * span
    maxy = tm.W - 1 * span
    bx = minx + span * 0.25
    by = maxy - span * 0.75
    big_x = [bx, bx + span * 0.5, bx + span * 0.5, bx, bx]
    big_y = [by, by, by + span * 0.5, by + span * 0.5, by]
    tiny = span * 2 / 4096  # ~2 tile units => area ~4 units^2
    tx0, ty0 = bx + span * 0.1, by + span * 0.1
    tiny_x = [tx0, tx0 + tiny, tx0 + tiny, tx0, tx0]
    tiny_y = [ty0, ty0, ty0 + tiny, ty0 + tiny, ty0]
    feats = spark.createDataFrame(
        [(1, gc.GEOM_POLYGON, big_x + tiny_x, big_y + tiny_y, [0, 5, 10], "c")],
        "feature_id long, geom_type int, xs array<double>, "
        "ys array<double>, part_offsets array<long>, caption string",
    )
    assigned = T.assign_tiles(feats, z, z, buffer_units=0)
    rings = {}
    for thr in (0.0, 25.0):
        dec = T.decode_tiles_to_features(
            T.encode_tiles(assigned, n_salts=2, area_threshold=thr)
        ).toPandas()
        assert len(dec) == 1
        rings[thr] = len(dec.part_offsets.iloc[0]) - 1
    assert rings[0.0] == 2
    assert rings[25.0] == 1


def test_zoom_thin_nested_and_kernel_parity(spark):
    """P6 thinning: the in-kernel mask equals the standalone post-
    filter row-for-row, kept sets are NESTED across zooms, and the
    keep rate tracks (den/num)^k."""
    from pyspark.sql import functions as F

    from mapnik_vector_tile_spark.plans.flagship import derive_points
    from tests.conftest import SF_DIR

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    pts = derive_points(orders, "o_orderkey")
    feats = pts.select(
        F.col("id").alias("feature_id"),
        F.lit(1).alias("geom_type"),
        F.array("mx").alias("xs"),
        F.array("my").alias("ys"),
        F.array(F.lit(0), F.lit(1)).alias("part_offsets"),
        F.lit("c").alias("caption"),
    )
    base_z = 8
    kern = T.assign_tiles(feats, 0, base_z, buffer_units=0,
                          thin_base_z=base_z)
    post = T.zoom_thin(
        T.assign_tiles(feats, 0, base_z, buffer_units=0), base_z
    )
    a = sorted(
        (r.z, r.feature_id, r.x, r.y)
        for r in kern.select("z", "feature_id", "x", "y").collect()
    )
    b = sorted(
        (r.z, r.feature_id, r.x, r.y)
        for r in post.select("z", "feature_id", "x", "y").collect()
    )
    assert a == b and len(a) > 0
    by_z = {}
    for z, fid, _, _ in a:
        by_z.setdefault(z, set()).add(fid)
    n_all = len(by_z[base_z])
    for z in range(base_z):
        assert by_z[z] <= by_z[z + 1], f"kept set not nested at z{z}"
        k = base_z - z
        expect = n_all * (2 / 5) ** k
        assert abs(len(by_z[z]) - expect) < max(6 * expect**0.5, 8), (
            z, len(by_z[z]), expect,
        )


def test_thin_thresholds_contract():
    import pytest

    from mapnik_vector_tile_spark.operators.tiling import thin_thresholds

    thr = thin_thresholds(10, 0)
    assert thr[10] == 1 << 53  # base zoom keeps everything
    assert all(thr[z] < thr[z + 1] for z in range(10))  # monotone
    assert thr[9] == ((1 << 53) * 2) // 5
    with pytest.raises(ValueError):
        thin_thresholds(10, 0, rate_num=2, rate_den=2)


def test_zoom_thin_spares_non_points(spark):
    """Thinning is POINT-only (tippecanoe --drop-rate semantics):
    polygons/lines must survive every zoom in both the in-kernel and
    the post-filter paths."""
    from pyspark.sql import functions as F

    rows = []
    for i in range(40):
        x0 = -10_000_000.0 + i * 300_000.0
        rows.append(
            (i, gc.GEOM_POLYGON,
             [x0, x0 + 9000.0, x0 + 9000.0, x0, x0],
             [0.0, 0.0, 9000.0, 9000.0, 0.0], [0, 5], "pg")
        )
    feats = spark.createDataFrame(rows, T.FEATURES_SCHEMA)
    kern = T.assign_tiles(feats, 0, 6, buffer_units=0, thin_base_z=6)
    per_z = {
        r["z"]: r["n"]
        for r in kern.groupBy("z")
        .agg(F.countDistinct("feature_id").alias("n"))
        .collect()
    }
    # every polygon present at every zoom (may cover >1 tile when it
    # straddles a boundary — count FEATURES, not rows)
    assert all(per_z[z] == 40 for z in range(7)), per_z
    post = T.zoom_thin(T.assign_tiles(feats, 0, 6, buffer_units=0), 6)
    assert post.count() == kern.count()


def test_utfgrid_codepoint_and_row_hash(spark):
    """Hand-computed UTFGrid pin: two points in tile (0,0) row 0 at
    cells cx=0 (id 20) and cx=1 (id 10). Ascending-id keys give
    ki(10)=1 -> cp 33, ki(20)=2 -> cp 35 (the '\"' gap at 34 is
    skipped), so rh = 35*31^0 + 33*31^1 = 1058."""
    from mapnik_vector_tile_spark.functions.tilemath import W
    from mapnik_vector_tile_spark.operators.tiling import utfgrid_rows

    span12 = 2.0 * W / (1 << 12)

    def pt(pid, cx, cy):
        return (
            pid,
            -W + (cx + 0.5) * span12,
            W - (cy + 0.5) * span12,
        )

    df = spark.createDataFrame(
        [pt(20, 0, 0), pt(10, 1, 0)], "id long, mx double, my double"
    )
    rows = utfgrid_rows(df, z=6).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["z"], r["x"], r["y"], r["row_idx"]) == (6, 0, 0, 0)
    assert r["n_cells"] == 2 and r["n_keys"] == 2
    assert r["rh"] == 35 + 33 * 31


def test_label_place_greedy_semantics(spark):
    """Hand-crafted candidates pin the greedy rules: priority by id,
    strict overlap (edge contact legal), and discards-don't-block —
    candidate 3 overlaps the DISCARDED candidate 2 but not placed 1,
    so it places."""
    from mapnik_vector_tile_spark.operators.tiling import label_place_greedy

    rows = [
        # (x, y, id, cx, cy, hw, hh)
        (0, 0, 1, 100, 100, 50, 20),   # places
        (0, 0, 2, 130, 100, 50, 20),   # overlaps 1 -> discarded
        (0, 0, 3, 210, 100, 30, 20),   # overlaps 2 only -> places
        (0, 0, 4, 200, 100, 50, 20),   # edge contact w/ 1 (dx=100=hw+hw)
                                       # but overlaps placed 3 -> discarded
        (0, 0, 5, 300, 100, 60, 20),   # overlaps 3? dx=90 >= 30+60 -> edge
                                       # contact, legal -> places
    ]
    df = spark.createDataFrame(
        rows, "x long, y long, id long, cx long, cy long, hw long, hh long"
    )
    r = label_place_greedy(df).collect()[0]
    assert r["n_cands"] == 5 and r["n_placed"] == 3
    want = sum((i * 2654435761) % (1 << 31) for i in (1, 3, 5))
    assert r["ph"] == want


def test_encode_batch_fast_path_matches_scalar():
    """The vectorized canonical-batch encoder must be byte-identical
    to the per-group scalar path on a mixed batch: all-singles groups
    (the handled set), groups with polygons, groups with null
    captions, groups whose singles are all out of bounds, and groups
    mixing ok/not-ok singles."""
    import numpy as np

    from mapnik_vector_tile_spark.operators import tiling as T
    from mapnik_vector_tile_spark.operators.grouped import group_starts

    rng = np.random.default_rng(9)
    rows = []
    # build a group-sorted synthetic batch over (z=5, x, y, salt=0)
    for g in range(30):
        kind = g % 5
        n = int(rng.integers(1, 6))
        for i in range(n):
            fid = g * 100 + i
            if kind == 3:  # polygon group -> scalar fallback
                rows.append((5, g, 0, 0, fid, 3, _poly_coords(), "c", False, 0, 0))
            elif kind == 4 and i == 0:  # null caption in group
                rows.append((5, g, 0, 0, fid, 1, None, None, True,
                             int(rng.integers(0, 4096)), int(rng.integers(0, 4096))))
            else:
                px = int(rng.integers(-500, 4596))  # some out of bounds
                py = int(rng.integers(-500, 4596))
                rows.append((5, g, 0, 0, fid, 1, None, f"cap-{fid % 7}", True, px, py))
    import pandas as pd

    pdf = pd.DataFrame(
        rows,
        columns=["z", "x", "y", "salt", "feature_id", "geom_type",
                 "coords", "caption", "is_single", "px", "py"],
    )
    keys = ["z", "x", "y", "salt"]
    prepare, encode_group, encode_batch = T.make_encode_kernel(
        "features", 4096, 64, emit_tiles=False
    )
    cols = {c: pdf[c].to_numpy() for c in pdf.columns}
    n = len(pdf)
    cols.update(prepare(cols, n))
    keycols = [cols[k] for k in keys]
    starts = group_starts(keycols, n)
    # scalar reference for every group
    ref = {}
    for i in range(len(starts) - 1):
        s = int(starts[i])
        sl = slice(s, int(starts[i + 1]))
        r = encode_group(tuple(c[s] for c in keycols), cols, sl)
        if r:
            ref[tuple(r[0][:3])] = r[0]
    # batch + fallback (the apply_grouped composition)
    got = {}
    brows, handled = encode_batch(keycols, cols, starts)
    assert handled.any() and not handled.all()
    for r in brows:
        got[tuple(r[:3])] = r
    for i in range(len(starts) - 1):
        if handled[i]:
            continue
        s = int(starts[i])
        sl = slice(s, int(starts[i + 1]))
        r = encode_group(tuple(c[s] for c in keycols), cols, sl)
        if r:
            got[tuple(r[0][:3])] = r[0]
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == ref[k], k


def _poly_coords():
    """Packed coords blob for a small triangle (matches
    tiling._unpack_coords wire shape)."""
    import numpy as np

    from mapnik_vector_tile_spark.operators.tiling import _pack_coords

    xs = np.array([0.0, 30000.0, 0.0])
    ys = np.array([0.0, 0.0, 30000.0])
    offs = np.array([0, 3], dtype=np.int64)
    return _pack_coords(xs, ys, offs)
