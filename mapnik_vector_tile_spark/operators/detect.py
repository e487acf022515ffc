"""Detection-box post-processing — the image-ML twin of mapnik's
label placement.

A 10^12-image curation pipeline that runs any object detector needs
greedy non-maximum suppression (NMS) as the post-filter before boxes
become training labels. The greedy shape is exactly the
placement_finder loop the engine already ships for labels
(`operators/tiling.label_place_greedy`, ref src/renderer_common/ —
process in priority order, earlier winners veto later candidates),
but with two detector-specific twists:

- priority is **score descending** (confidence), not feature id;
- the veto test is **IoU > threshold** against an already-KEPT box,
  not mere overlap.

Scale shape: ONE hash shuffle on image_id, then a per-image O(k²)
kernel where k is the per-image detection count (bounded by the
detector's top-k, typically ≤ 300) — the 100 TB axis is image count,
which parallelizes perfectly. No cross-image state exists, so there
is no skew beyond the per-image k bound.

Exactness: boxes are integer pixel rectangles (half-open, x1 > x0),
and the IoU gate is evaluated in cross-multiplied integer form —
suppress iff  inter · (100 + pct) > pct · (areaA + areaB)
(algebraically identical to inter/union > pct/100 with
union = areaA + areaB − inter, but division-free) — so Spark and the
DuckDB recursive-CTE oracle agree bit-for-bit, and the boundary case
IoU == pct/100 is pinned KEPT (strict >)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PH = 2654435761  # Knuth multiplicative hash, matches label_place_greedy
_PH_MOD = 1 << 31


def nms_boxes(dets: DataFrame, iou_pct: int = 50) -> DataFrame:
    """Greedy per-image NMS.

    Input columns (all long): image_id, det_id, x0, y0, x1, y1, score
    — half-open integer pixel boxes, x1 > x0 and y1 > y0.

    Order: score DESC, det_id ASC (the deterministic tie-break every
    serious detector pins, else shard order leaks into the output).
    A candidate is kept iff NO already-kept box in the same image has
    integer-IoU strictly above `iou_pct`/100 with it; suppressed
    candidates do NOT veto later ones (identical to the label rule).

    Output one row per image:
    (image_id, n_dets, n_kept, kh, ka) with
    kh = Σ over kept of (det_id·2654435761 mod 2³¹)  — order-free
    sequence-sensitive witness (one wrong early keep cascades), and
    ka = Σ over kept of box area — a second, size-sensitive witness.
    """
    import pandas as pd

    pct = int(iou_pct)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["score", "det_id"], ascending=[False, True], kind="mergesort"
        )
        x0 = pdf["x0"].to_numpy(np.int64)
        y0 = pdf["y0"].to_numpy(np.int64)
        x1 = pdf["x1"].to_numpy(np.int64)
        y1 = pdf["y1"].to_numpy(np.int64)
        ids = pdf["det_id"].to_numpy(np.int64)
        area = (x1 - x0) * (y1 - y0)
        kept = np.zeros(len(ids), dtype=bool)
        for k in range(len(ids)):
            p = kept[:k]
            iw = np.minimum(x1[:k][p], x1[k]) - np.maximum(x0[:k][p], x0[k])
            ih = np.minimum(y1[:k][p], y1[k]) - np.maximum(y0[:k][p], y0[k])
            inter = np.maximum(iw, 0) * np.maximum(ih, 0)
            hit = (inter * (100 + pct) > pct * (area[:k][p] + area[k])).any()
            kept[k] = not hit
        kh = int(((ids[kept] * _PH) % _PH_MOD).sum())
        return pd.DataFrame(
            [
                (
                    int(pdf["image_id"].iloc[0]),
                    len(ids),
                    int(kept.sum()),
                    kh,
                    int(area[kept].sum()),
                )
            ],
            columns=["image_id", "n_dets", "n_kept", "kh", "ka"],
        )

    return (
        dets.select("image_id", "det_id", "x0", "y0", "x1", "y1", "score")
        .groupBy("image_id")
        .applyInPandas(
            kernel,
            "image_id long, n_dets long, n_kept long, kh long, ka long",
        )
    )


def reading_order(dets: DataFrame) -> DataFrame:
    """Document-AI reading order — sort detection/OCR boxes into
    line-grouped reading order (the layout-analysis step after NMS in
    every OCR pipeline: Tesseract/LayoutLM-style top-to-bottom lines,
    left-to-right within a line).

    Line grouping is the TRANSITIVE CLOSURE of pairwise "same line":
    two boxes share a line iff their vertical overlap is at least half
    the SHORTER box's height (2·ov ≥ min(h_a, h_b), inclusive —
    pinned). Components are labeled with min-det-id roots (the
    engine's standard CC convention); lines order by (min y0 in line,
    root id), boxes within a line by (x0, det_id).

    Per-image kernel after one image_id shuffle (k = boxes/page is
    detector-bounded, the 100 TB axis is page count). Output one row
    per box: (image_id, det_id, line_no, pos) — per-box witness
    granularity; the DuckDB twin recomputes the closure with a
    reachability CTE and independent window ranks."""
    import pandas as pd

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("det_id", kind="mergesort")
        ids = pdf["det_id"].to_numpy(np.int64)
        x0 = pdf["x0"].to_numpy(np.int64)
        y0 = pdf["y0"].to_numpy(np.int64)
        y1 = pdf["y1"].to_numpy(np.int64)
        k = len(ids)
        h = y1 - y0
        ov = np.minimum.outer(y1, y1) - np.maximum.outer(y0, y0)
        same = 2 * ov >= np.minimum.outer(h, h)
        np.fill_diagonal(same, True)
        lbl = np.arange(k)
        while True:
            new = np.where(same, lbl[None, :], k).min(axis=1)
            new = np.minimum(new, lbl)
            if (new == lbl).all():
                break
            lbl = new
        # line sort key: (min y0 in comp, root det_id)
        miny = np.full(k, np.int64(1) << 60)
        np.minimum.at(miny, lbl, y0)
        order = sorted(set(lbl), key=lambda r: (miny[r], ids[r]))
        line_no = {r: i for i, r in enumerate(order)}
        rows = sorted(
            range(k), key=lambda i: (line_no[lbl[i]], x0[i], ids[i])
        )
        out_line = np.empty(k, np.int64)
        out_pos = np.empty(k, np.int64)
        pos = 0
        prev_line = -1
        for i in rows:
            ln = line_no[lbl[i]]
            pos = pos + 1 if ln == prev_line else 0
            prev_line = ln
            out_line[i] = ln
            out_pos[i] = pos
        return pd.DataFrame(
            {
                "image_id": pdf["image_id"].to_numpy(),
                "det_id": ids,
                "line_no": out_line,
                "pos": out_pos,
            }
        )

    return (
        dets.select("image_id", "det_id", "x0", "y0", "y1")
        .groupBy("image_id")
        .applyInPandas(
            kernel, "image_id long, det_id long, line_no long, pos long"
        )
    )


EVAL_SCALE_BITS = 34  # floor-scaled IoU argmax key: exact for
# union <= 2^17 (boxes up to ~360 px on a side) — distinct IoU
# fractions differ by >= 1/(u_a*u_b) > 2^-34, so scaled-key equality
# is exact equality (same argument as the snap join / Otsu argmax)


def match_detections(
    preds: DataFrame, gts: DataFrame, iou_pct: int = 50
) -> DataFrame:
    """Detection evaluation — greedy IoU matching of predictions to
    ground truth, the TP-assignment step of VOC/COCO mAP: predictions
    in score-DESC/id-ASC order each claim the UNMATCHED ground-truth
    box of highest IoU strictly above `iou_pct`/100 (tie → smallest
    gt_id); claimed boxes leave the pool.

    Both the threshold test and the arg-max are division-free:
    threshold as in NMS (inter·(100+pct) > pct·(areaP+areaG)); the
    arg-max via the floor-scaled key (inter << 34) // union, exact by
    the min-gap argument above.

    preds: (image_id, det_id, x0, y0, x1, y1, score);
    gts: (image_id, gt_id, x0, y0, x1, y1).
    Output per image: (image_id, n_pred, n_gt, tp, mh) with
    mh = Σ over matches ((det_id·31 + gt_id)·2654435761 mod 2³¹) —
    pair-sensitive, so a swapped assignment changes it even at equal
    TP count. One image_id shuffle; O(k_p·k_g) per image, detector-
    bounded."""
    import pandas as pd

    pct = int(iou_pct)

    def cokernel(key, pp: pd.DataFrame, gg: pd.DataFrame) -> pd.DataFrame:
        image_id = int(key[0])
        pp = pp.sort_values(
            ["score", "det_id"], ascending=[False, True], kind="mergesort"
        )
        gx0 = gg["x0"].to_numpy(np.int64)
        gy0 = gg["y0"].to_numpy(np.int64)
        gx1 = gg["x1"].to_numpy(np.int64)
        gy1 = gg["y1"].to_numpy(np.int64)
        gid = gg["gt_id"].to_numpy(np.int64)
        garea = (gx1 - gx0) * (gy1 - gy0)
        taken = np.zeros(len(gid), dtype=bool)
        tp = 0
        mh = 0
        for r in pp.itertuples():
            parea = (r.x1 - r.x0) * (r.y1 - r.y0)
            iw = np.minimum(gx1, r.x1) - np.maximum(gx0, r.x0)
            ih = np.minimum(gy1, r.y1) - np.maximum(gy0, r.y0)
            inter = np.maximum(iw, 0) * np.maximum(ih, 0)
            ok = (
                (~taken)
                & (inter * (100 + pct) > pct * (garea + parea))
            )
            if not ok.any():
                continue
            union = garea + parea - inter
            key_s = np.where(
                ok, (inter << EVAL_SCALE_BITS) // np.maximum(union, 1), -1
            )
            best = np.lexsort((gid, -key_s))[0]
            taken[best] = True
            tp += 1
            mh = (
                mh
                + ((r.det_id * 31 + int(gid[best])) * _PH) % _PH_MOD
            ) % _PH_MOD
        return pd.DataFrame(
            [(image_id, len(pp), len(gg), tp, mh)],
            columns=["image_id", "n_pred", "n_gt", "tp", "mh"],
        )

    return (
        preds.groupBy("image_id")
        .cogroup(gts.groupBy("image_id"))
        .applyInPandas(
            cokernel,
            "image_id long, n_pred long, n_gt long, tp long, mh long",
        )
    )


def match_detection_flags(
    preds: DataFrame, gts: DataFrame, iou_pct: int = 50
) -> DataFrame:
    """Per-detection TP flags — match_detections' greedy claim chain
    emitted row-per-prediction instead of aggregated: the input the
    PR curve / AP computation needs.  Identical pinned semantics
    (score-DESC/id-ASC claim order, division-free threshold,
    floor-scaled IoU arg-max, smallest-gt ties).

    Output: (image_id, det_id, score, hit)."""
    import pandas as pd

    pct = int(iou_pct)

    def cokernel(key, pp: pd.DataFrame, gg: pd.DataFrame) -> pd.DataFrame:
        image_id = int(key[0])
        pp = pp.sort_values(
            ["score", "det_id"], ascending=[False, True], kind="mergesort"
        )
        gx0 = gg["x0"].to_numpy(np.int64)
        gy0 = gg["y0"].to_numpy(np.int64)
        gx1 = gg["x1"].to_numpy(np.int64)
        gy1 = gg["y1"].to_numpy(np.int64)
        gid = gg["gt_id"].to_numpy(np.int64)
        garea = (gx1 - gx0) * (gy1 - gy0)
        taken = np.zeros(len(gid), dtype=bool)
        rows = []
        for r in pp.itertuples():
            parea = (r.x1 - r.x0) * (r.y1 - r.y0)
            iw = np.minimum(gx1, r.x1) - np.maximum(gx0, r.x0)
            ih = np.minimum(gy1, r.y1) - np.maximum(gy0, r.y0)
            inter = np.maximum(iw, 0) * np.maximum(ih, 0)
            ok = (
                (~taken)
                & (inter * (100 + pct) > pct * (garea + parea))
            )
            hit = 0
            if ok.any():
                union = garea + parea - inter
                key_s = np.where(
                    ok,
                    (inter << EVAL_SCALE_BITS) // np.maximum(union, 1),
                    -1,
                )
                best = np.lexsort((gid, -key_s))[0]
                taken[best] = True
                hit = 1
            rows.append((image_id, int(r.det_id), int(r.score), hit))
        return pd.DataFrame(
            rows, columns=["image_id", "det_id", "score", "hit"]
        )

    return (
        preds.groupBy("image_id")
        .cogroup(gts.groupBy("image_id"))
        .applyInPandas(
            cokernel,
            "image_id long, det_id long, score long, hit long",
        )
    )


def auc_exact(flags: DataFrame) -> DataFrame:
    """T12t exact ROC-AUC per group — the Mann–Whitney U form every
    eval harness reports, kept integer-exact with midrank ties:
        AUC = (Σ_{pos,neg} [s_p > s_n] + ½[s_p = s_n]) / (P·N)
    emitted as the BIGINT pair (auc_num, auc_den) = (2U, 2PN), with
    2U = Σ_scores pos_s · (2·neg_below_s + neg_s) — one
    map-side-combined per-(group, score) count aggregate and one
    PER-GROUP window over the quantized score DOMAIN (the pr_curve
    bound: rows per group ≤ distinct scores, not detections).
    Degenerate groups (no positives or no negatives) carry a NULL
    auc_dbl and den = 0 rather than a division blow-up (the morans_i
    guard idiom).

    flags: (g, score, hit ∈ {0,1}).  Output per g:
    (g, n_pos, n_neg, auc_num, auc_den, auc_dbl)."""
    from pyspark.sql import Window

    per_score = flags.groupBy("g", "score").agg(
        F.sum("hit").cast("long").alias("pos_s"),
        F.sum(1 - F.col("hit")).cast("long").alias("neg_s"),
    )
    w = Window.partitionBy("g").orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = per_score.withColumn(
        "neg_below", F.coalesce(F.sum("neg_s").over(w), F.lit(0))
    )
    return ranked.groupBy("g").agg(
        F.sum("pos_s").cast("long").alias("n_pos"),
        F.sum("neg_s").cast("long").alias("n_neg"),
        F.sum(
            F.col("pos_s")
            * (2 * F.col("neg_below") + F.col("neg_s"))
        ).cast("long").alias("auc_num"),
    ).select(
        "g",
        "n_pos",
        "n_neg",
        "auc_num",
        (2 * F.col("n_pos") * F.col("n_neg")).cast("long").alias(
            "auc_den"
        ),
        F.when(
            (F.col("n_pos") == 0) | (F.col("n_neg") == 0),
            F.lit(None).cast("double"),
        ).otherwise(
            F.col("auc_num").cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
        ).alias("auc_dbl"),
    )


def pr_curve(flags: DataFrame) -> DataFrame:
    """T12s PR-curve points — global (score DESC, image_id, det_id)
    rank over the per-detection flags with cumulative TP/FP: the
    exact-integer relation AP/mAP integrates.

    TWO-PASS exact rank, no data-proportional global window: scores
    are quantized integers (a bounded confidence domain), so
    (1) a map-side-combined per-score aggregate (cnt, Σhit) folds the
        corpus down to one row per distinct score — DOMAIN-bounded,
        not detection-bounded;
    (2) exclusive prefix sums over that tiny relation (the only
        unpartitioned window — do not lift it onto raw detections)
        give every score its global rank / TP offset, broadcast back;
    (3) a PER-SCORE partitioned window orders ties by
        (image_id, det_id) and adds the offsets.
    Identical output to the single-window form at any parallelism.

    Output: (rnk, image_id, det_id, score, hit, n_tp, n_fp)."""
    from pyspark.sql import Window

    per_score = flags.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("hit").cast("long").alias("tp"),
    )
    woff = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = per_score.select(
        "score",
        F.coalesce(F.sum("cnt").over(woff), F.lit(0)).alias("off_n"),
        F.coalesce(F.sum("tp").over(woff), F.lit(0)).alias("off_tp"),
    )
    wloc = Window.partitionBy("score").orderBy("image_id", "det_id")
    run = wloc.rowsBetween(Window.unboundedPreceding, 0)
    local = flags.select(
        "image_id",
        "det_id",
        "score",
        "hit",
        F.row_number().over(wloc).cast("long").alias("lrnk"),
        F.sum("hit").over(run).cast("long").alias("ltp"),
    )
    return local.join(F.broadcast(offs), "score").select(
        (F.col("off_n") + F.col("lrnk")).cast("long").alias("rnk"),
        "image_id",
        "det_id",
        "score",
        "hit",
        (F.col("off_tp") + F.col("ltp")).cast("long").alias("n_tp"),
        (
            F.col("off_n") + F.col("lrnk") - F.col("off_tp") - F.col("ltp")
        ).cast("long").alias("n_fp"),
    )
