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
