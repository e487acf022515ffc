"""NMS semantics pins: score-order priority, strict IoU boundary,
suppressed-doesn't-veto, and corpus non-degeneracy."""

import pytest

from mapnik_vector_tile_spark.operators.detect import nms_boxes


def _run(spark, rows, pct=50):
    df = spark.createDataFrame(
        rows,
        "image_id long, det_id long, x0 long, y0 long, x1 long, "
        "y1 long, score long",
    )
    out = nms_boxes(df, pct).collect()
    return {r["image_id"]: r for r in out}


def test_identical_boxes_keep_highest_score(spark):
    # three identical boxes: only the top-score one survives; det_id
    # tie-break picks the LOWER id at equal score
    rows = [
        (1, 10, 0, 0, 100, 100, 500),
        (1, 11, 0, 0, 100, 100, 900),
        (1, 12, 0, 0, 100, 100, 900),
    ]
    r = _run(spark, rows)[1]
    assert (r["n_dets"], r["n_kept"]) == (3, 1)
    assert r["kh"] == (11 * 2654435761) % (1 << 31)
    assert r["ka"] == 100 * 100


def test_iou_boundary_is_kept(spark):
    # two 100x100 boxes overlapping 50x100: inter=5000, union=15000,
    # IoU = 1/3 < 0.5 → kept. Shift to 75 overlap: inter=7500,
    # union=12500, IoU=0.6 > 0.5 → suppressed. Exact 50%: boxes
    # 0..100 and 0..100 vs 0..100/2-width — construct inter/union
    # exactly 1/2: A=(0,0,100,100), B=(0,0,100,50): inter=5000,
    # union=10000 → IoU exactly 0.5 → STRICT > means kept.
    rows = [
        (1, 1, 0, 0, 100, 100, 900),
        (1, 2, 0, 0, 100, 50, 800),  # IoU == 0.5 exactly → kept
        (2, 1, 0, 0, 100, 100, 900),
        (2, 2, 25, 0, 125, 100, 800),  # inter 7500/union 12500 = .6 → out
    ]
    d = _run(spark, rows)
    assert d[1]["n_kept"] == 2
    assert d[2]["n_kept"] == 1


def test_suppressed_does_not_veto(spark):
    # B overlaps A (suppressed); C overlaps B heavily but NOT A →
    # C is kept because only KEPT boxes veto
    rows = [
        (7, 1, 0, 0, 100, 100, 900),
        (7, 2, 40, 0, 140, 100, 800),  # IoU with A = 60/140 ≈ .43 — kept!
        (7, 3, 90, 0, 190, 100, 700),  # vs B: 50/150=.33 kept; pick harder
    ]
    # make B actually suppressed by A: move B to 20 overlap 80
    rows[1] = (7, 2, 20, 0, 120, 100, 800)  # inter 8000 union 12000 = .67
    # C overlaps B's span but barely touches A: A∩C = 10 cols → IoU .05
    rows[2] = (7, 3, 90, 0, 190, 100, 700)
    r = _run(spark, rows)[7]
    # A kept, B suppressed by A, C: vs A inter=1000 union=19000 → kept
    assert r["n_kept"] == 2
    assert r["kh"] == sum(
        (i * 2654435761) % (1 << 31) for i in (1, 3)
    )


def test_disjoint_images_independent(spark):
    rows = [
        (1, 1, 0, 0, 10, 10, 5),
        (2, 2, 0, 0, 10, 10, 5),
    ]
    d = _run(spark, rows)
    assert d[1]["n_kept"] == 1 and d[2]["n_kept"] == 1


@pytest.mark.parametrize("pct", [30, 50, 70])
def test_threshold_monotone(spark, pct):
    # higher threshold ⇒ never fewer kept boxes (suppression is rarer)
    rows = [
        (1, i, 10 * i, 0, 10 * i + 60, 60, 1000 - i) for i in range(8)
    ]
    kept = _run(spark, rows, pct)[1]["n_kept"]
    kept_hi = _run(spark, rows, min(pct + 20, 99))[1]["n_kept"]
    assert kept_hi >= kept


def test_corpus_nondegenerate(spark):
    # the q_nms corpus at sf0.001 must actually exercise suppression
    from mapnik_vector_tile_spark.plans.detect_oracles import q_nms

    rows = q_nms(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    assert any(r["n_kept"] < r["n_dets"] for r in rows)
    assert all(1 <= r["n_kept"] <= r["n_dets"] for r in rows)


# --- blob labeling (raster.blob_stats) -------------------------------------


def _img_row(image_id, gray):
    """Grayscale uint8 grid -> images-table row. 77+151+28 = 256, so
    r=g=b=v gives luma8 exactly v: the mask (v % 4 == 0) is directly
    hand-controllable."""
    import numpy as np

    g = np.asarray(gray, dtype=np.uint8)
    h, w = g.shape
    rgba = np.stack([g, g, g, np.full_like(g, 255)], axis=-1)
    return (image_id, bytearray(rgba.tobytes()), int(w), int(h),
            "raw-rgba8", "cap " + image_id)


def _blobs(spark, rows):
    from mapnik_vector_tile_spark.operators.raster import blob_stats

    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string",
    )
    return {r["image_id"]: r for r in blob_stats(df).collect()}


def test_blob_hand_image(spark):
    # 4x4: '4' pixels are mask-on (4%4==0), '1' off. Two components:
    # an L of size 3 rooted at pid 0, a singleton at pid 15.
    g = [
        [4, 1, 1, 1],
        [4, 4, 1, 1],
        [1, 1, 1, 1],
        [1, 1, 1, 4],
    ]
    r = _blobs(spark, [_img_row("a", g)])["a"]
    assert (r["n_fg"], r["n_comps"], r["max_comp"]) == (4, 2, 3)
    assert r["ch"] == (0 * 1000003 + 3) % 2147483647 + (
        15 * 1000003 + 1
    ) % 2147483647


def test_blob_diagonal_not_connected(spark):
    # 4-connectivity: diagonal touch = two components
    g = [
        [4, 1],
        [1, 4],
    ]
    r = _blobs(spark, [_img_row("d", g)])["d"]
    assert (r["n_fg"], r["n_comps"], r["max_comp"]) == (2, 2, 1)


def test_blob_empty_mask(spark):
    g = [[1, 1], [1, 1]]
    r = _blobs(spark, [_img_row("e", g)])["e"]
    assert (r["n_fg"], r["n_comps"], r["max_comp"], r["ch"]) == (0, 0, 0, 0)


def test_blob_corpus_relax_bound_and_invariants():
    # corpus-shape invariant: measured min-label fixpoint distance on
    # the fixed 400-image corpus must stay <= 20 (the r5 recursive-CTE
    # twin no longer needs an unroll margin — this now pins that the
    # recursion's working set stays component-bounded and small)
    import numpy as np

    from mapnik_vector_tile_spark.sources.synth import make_pixels

    INF = np.int64(1) << np.int64(62)
    worst = 0
    for i in range(400):
        w = 16 + (i * 7) % 49
        h = 16 + (i * 11) % 49
        a = make_pixels(i, w, h).astype(np.int64)
        g = (a[..., 0] * 77 + a[..., 1] * 151 + a[..., 2] * 28) >> 8
        mask = (g % 4) == 0
        pid = np.arange(h * w, dtype=np.int64).reshape(h, w)
        lbl = np.where(mask, pid, INF)
        it = 0
        while True:
            up = np.full_like(lbl, INF)
            up[1:, :] = lbl[:-1, :]
            dn = np.full_like(lbl, INF)
            dn[:-1, :] = lbl[1:, :]
            lf = np.full_like(lbl, INF)
            lf[:, 1:] = lbl[:, :-1]
            rt = np.full_like(lbl, INF)
            rt[:, :-1] = lbl[:, 1:]
            nb = np.minimum(np.minimum(up, dn), np.minimum(lf, rt))
            new = np.where(mask, np.minimum(lbl, nb), INF)
            if (new == lbl).all():
                break
            lbl = new
            it += 1
        worst = max(worst, it)
    assert worst <= 20, worst


# --- reading order (detect.reading_order) ----------------------------------


def _ro(spark, rows):
    from mapnik_vector_tile_spark.operators.detect import reading_order

    df = spark.createDataFrame(
        rows, "image_id long, det_id long, x0 long, y0 long, x1 long, y1 long"
    )
    return {
        (r["image_id"], r["det_id"]): (r["line_no"], r["pos"])
        for r in reading_order(df).collect()
    }


def test_reading_order_two_lines(spark):
    # line 1: boxes at y 0..20; line 2: y 100..120. Within-line order
    # by x0 regardless of det_id.
    rows = [
        (1, 10, 500, 0, 560, 20),   # line 0, x=500 → pos 1
        (1, 11, 100, 2, 160, 22),   # line 0, x=100 → pos 0
        (1, 12, 300, 100, 360, 120),  # line 1 → pos 0
    ]
    d = _ro(spark, rows)
    assert d[(1, 11)] == (0, 0)
    assert d[(1, 10)] == (0, 1)
    assert d[(1, 12)] == (1, 0)


def test_reading_order_transitive_chain(spark):
    # a tall box bridges two small boxes that do NOT overlap each
    # other: transitivity must put all three on one line
    rows = [
        (1, 1, 0, 0, 50, 20),      # top small
        (1, 2, 60, 30, 110, 50),   # bottom small — no overlap with 1
        (1, 3, 120, 0, 170, 50),   # tall, ≥50% overlap with both
    ]
    d = _ro(spark, rows)
    lines = {d[k][0] for k in d}
    assert lines == {0}
    # order by x0: 1 (x=0), 2 (x=60), 3 (x=120)
    assert d[(1, 1)] == (0, 0) and d[(1, 2)] == (0, 1) and d[(1, 3)] == (0, 2)


def test_reading_order_half_overlap_boundary(spark):
    # overlap exactly half the shorter box → SAME line (inclusive pin)
    rows = [
        (1, 1, 0, 0, 50, 20),    # h=20
        (1, 2, 60, 10, 110, 40), # overlap = 10 = h1/2 → 2*10 >= 20 ✓
    ]
    d = _ro(spark, rows)
    assert d[(1, 1)][0] == d[(1, 2)][0]
    # one pixel less overlap → different lines
    rows[1] = (1, 2, 60, 11, 110, 41)
    d = _ro(spark, rows)
    assert d[(1, 1)][0] != d[(1, 2)][0]


# --- detection evaluation (detect.match_detections) ------------------------


def _eval(spark, preds, gts, pct=50):
    from mapnik_vector_tile_spark.operators.detect import match_detections

    p = spark.createDataFrame(
        preds,
        "image_id long, det_id long, x0 long, y0 long, x1 long, y1 long, "
        "score long",
    )
    g = spark.createDataFrame(
        gts, "image_id long, gt_id long, x0 long, y0 long, x1 long, y1 long"
    )
    return {r["image_id"]: r for r in match_detections(p, g, pct).collect()}


def test_eval_exact_match_and_double_claim(spark):
    # two preds both over one GT: only the higher-score one claims it
    preds = [
        (1, 1, 0, 0, 100, 100, 900),
        (1, 2, 0, 0, 100, 100, 800),
    ]
    gts = [(1, 7, 0, 0, 100, 100)]
    r = _eval(spark, preds, gts)[1]
    assert (r["tp"], r["n_pred"], r["n_gt"]) == (1, 2, 1)
    assert r["mh"] == ((1 * 31 + 7) * 2654435761) % (1 << 31)


def test_eval_picks_highest_iou_gt(spark):
    preds = [(1, 1, 0, 0, 100, 100, 900)]
    gts = [
        (1, 5, 0, 0, 100, 50),    # IoU 0.5
        (1, 6, 0, 0, 100, 90),    # IoU 0.9 — should be claimed
    ]
    r = _eval(spark, preds, gts)[1]
    assert r["tp"] == 1
    assert r["mh"] == ((1 * 31 + 6) * 2654435761) % (1 << 31)


def test_eval_threshold_strict(spark):
    # IoU exactly 0.5 is NOT a match (strict >)
    preds = [(1, 1, 0, 0, 100, 100, 900)]
    gts = [(1, 5, 0, 0, 100, 50)]
    r = _eval(spark, preds, gts)[1]
    assert r["tp"] == 0 and r["mh"] == 0


def test_eval_no_gt_image(spark):
    r = _eval(spark, [(1, 1, 0, 0, 10, 10, 5)], [(2, 9, 0, 0, 10, 10)])
    assert r[1]["tp"] == 0 and r[1]["n_gt"] == 0
    assert r[2]["n_pred"] == 0 and r[2]["n_gt"] == 1


def test_harris_synthetic_corner(spark):
    import numpy as np

    from mapnik_vector_tile_spark.operators.raster import (
        encode_image,
        harris_corner_stats,
    )

    # a bright axis-aligned square on black: strong responses at its
    # 4 corners, edges alone must NOT fire (that's the Harris point)
    img = np.zeros((24, 24, 4), dtype=np.uint8)
    img[..., 3] = 255
    img[6:18, 6:18, :3] = 255
    rows = [("img_a", encode_image(img, "raw-rgba8"), 24, 24,
             "raw-rgba8", "cap a")]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string,"
        " caption string"
    )
    out = harris_corner_stats(df).collect()[0]
    assert out["n_corners"] >= 4
    assert out["max_r"] > 0
    assert out["caption"] == "cap a"

    # a pure vertical edge image: no corners anywhere
    edge = np.zeros((24, 24, 4), dtype=np.uint8)
    edge[..., 3] = 255
    edge[:, 12:, :3] = 255
    df2 = spark.createDataFrame(
        [("img_b", encode_image(edge, "raw-rgba8"), 24, 24,
          "raw-rgba8", "cap b")],
        "image_id string, bytes binary, w int, h int, fmt string,"
        " caption string",
    )
    out2 = harris_corner_stats(df2).collect()[0]
    assert out2["n_corners"] == 0


def test_pr_curve_flags_and_cumulatives(spark):
    from mapnik_vector_tile_spark.operators.detect import (
        match_detection_flags,
        pr_curve,
    )

    preds = spark.createDataFrame(
        [
            # image 0: det 1 (high score, matches gt), det 2 (misses)
            (0, 1, 0, 0, 10, 10, 900),
            (0, 2, 50, 50, 60, 60, 800),
            # image 1: det 3 matches
            (1, 3, 0, 0, 10, 10, 850),
        ],
        "image_id long, det_id long, x0 long, y0 long, x1 long,"
        " y1 long, score long",
    )
    gts = spark.createDataFrame(
        [(0, 10, 0, 0, 10, 10), (1, 11, 1, 1, 11, 11)],
        "image_id long, gt_id long, x0 long, y0 long, x1 long, y1 long",
    )
    out = sorted(
        pr_curve(match_detection_flags(preds, gts)).collect(),
        key=lambda r: r["rnk"],
    )
    assert [(r["det_id"], r["hit"]) for r in out] == [
        (1, 1), (3, 1), (2, 0)
    ]
    assert [(r["n_tp"], r["n_fp"]) for r in out] == [
        (1, 0), (2, 0), (2, 1)
    ]


def test_pr_curve_two_pass_matches_single_window(spark):
    """The bucketed two-pass rank must equal the naive global-window
    form bit-for-bit, including heavy score ties across images."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mapnik_vector_tile_spark.operators.detect import pr_curve

    rows = []
    for i in range(300):
        # only 7 distinct scores -> large tie groups spanning images
        rows.append((i % 13, i, (i * 37) % 7, (i * 2654435761) % 2))
    flags = spark.createDataFrame(
        rows, "image_id long, det_id long, score long, hit long"
    )
    w = Window.orderBy(F.col("score").desc(), "image_id", "det_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    naive = flags.select(
        F.row_number().over(w).cast("long").alias("rnk"),
        "image_id", "det_id", "score", "hit",
        F.sum("hit").over(run).cast("long").alias("n_tp"),
        F.sum(1 - F.col("hit")).over(run).cast("long").alias("n_fp"),
    )
    got = sorted(map(tuple, pr_curve(flags).collect()))
    want = sorted(map(tuple, naive.collect()))
    assert got == want


def test_auc_exact_against_sklearn_free_reference(spark):
    """T12t: exact AUC equals the brute pairwise U with midrank ties;
    perfect/inverted/degenerate cases pinned."""
    from fractions import Fraction

    from mapnik_vector_tile_spark.operators.detect import auc_exact

    cases = {
        0: [(1, 0), (2, 0), (3, 1), (4, 1)],      # perfect: AUC 1
        1: [(1, 1), (2, 1), (3, 0), (4, 0)],      # inverted: AUC 0
        2: [(1, 0), (1, 1), (2, 0), (2, 1)],      # heavy ties
        3: [(5, 1), (6, 1)],                       # no negatives
    }
    rows = [(g, s, h) for g, pts in cases.items() for s, h in pts]
    df = spark.createDataFrame(rows, "g long, score long, hit long")
    got = {r.g: r for r in auc_exact(df).collect()}
    for g, pts in cases.items():
        pos = [s for s, h in pts if h]
        neg = [s for s, h in pts if not h]
        r = got[g]
        assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
        if pos and neg:
            two_u = sum(
                2 * (p > n) + (p == n) for p in pos for n in neg
            )
            assert (r.auc_num, r.auc_den) == (
                two_u, 2 * len(pos) * len(neg)
            )
            assert Fraction(r.auc_num, r.auc_den) == Fraction(
                two_u, 2 * len(pos) * len(neg)
            )
        else:
            assert r.auc_dbl is None and r.auc_den == 0
    assert Fraction(got[0].auc_num, got[0].auc_den) == 1
    assert Fraction(got[1].auc_num, got[1].auc_den) == 0
    assert Fraction(got[2].auc_num, got[2].auc_den) == Fraction(1, 2)
