"""BPE trainer pins: known merge sequence on a hand-computable corpus,
left-to-right non-overlapping merge, frequency weighting, tie-break."""

from mapnik_vector_tile_spark.operators.textstats import bpe_train


def _train(spark, texts, rounds):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    return bpe_train(df, rounds=rounds).collect()


def test_known_merges(spark):
    # corpus: "aaab" x3, "ab" x2 (as repeated words in docs)
    # round 1 pairs: (a,a): 2*3=6, (a,b): 3+2=5 → merge (a,a)→aa
    # "aaab" → [aa, a, b]; round 2 pairs: (aa,a):3, (a,b):5 → (a,b)→ab
    rows = _train(spark, ["aaab aaab aaab ab ab"], 2)
    assert [(r["round"], r["p1"], r["p2"], r["cnt"]) for r in rows] == [
        (1, "a", "a", 6),
        (2, "a", "b", 5),
    ]


def test_nonoverlapping_left_to_right(spark):
    # "aaaa": round-1 (a,a) count = 3 (overlapping pairs counted per
    # position), merge produces [aa, aa] NOT [aa, a, a]; round 2 must
    # therefore see (aa,aa)
    rows = _train(spark, ["aaaa"], 2)
    assert (rows[0]["p1"], rows[0]["p2"]) == ("a", "a")
    assert (rows[1]["p1"], rows[1]["p2"]) == ("aa", "aa")


def test_tiebreak_lexicographic(spark):
    # "xy" and "ab" each appear once → pair counts tie at 1;
    # lexicographically smallest pair (a,b) must win
    rows = _train(spark, ["xy ab"], 1)
    assert (rows[0]["p1"], rows[0]["p2"], rows[0]["cnt"]) == ("a", "b", 1)


def test_merged_token_boundary_safe(spark):
    # after merging (a,b)→ab, the pair (b,a) inside "abab" must NOT
    # match across the ab|ab boundary in the string representation
    rows = _train(spark, ["abab abab ce"], 2)
    assert (rows[0]["p1"], rows[0]["p2"]) == ("a", "b")
    # round 2: tokens [ab, ab] → only pair (ab, ab) with count 2
    assert (rows[1]["p1"], rows[1]["p2"], rows[1]["cnt"]) == ("ab", "ab", 2)


# --- span corruption -------------------------------------------------------


def test_span_corruption_spans_and_hash(spark):
    import numpy as np

    from mapnik_vector_tile_spark.operators.textstats import (
        SPAN_MIX,
        span_corruption_stats,
    )
    from mapnik_vector_tile_spark.sources.synth import splitmix64

    text = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    r = span_corruption_stats(df, rate_pct=15).collect()[0]
    words = text.split()
    keys = np.array(
        [7 * SPAN_MIX + i for i in range(len(words))], dtype=np.uint64
    )
    dropped = (splitmix64(keys) % np.uint64(100)) < np.uint64(15)
    n_spans = int(
        sum(
            1
            for i in range(len(words))
            if dropped[i] and (i == 0 or not dropped[i - 1])
        )
    )
    kh = sum(
        (i + 1) * len(w)
        for i, w in enumerate(words)
        if not dropped[i]
    ) % (1 << 31)
    assert r["n_words"] == len(words)
    assert r["n_dropped"] == int(dropped.sum())
    assert r["n_spans"] == n_spans
    assert r["kh"] == kh


def test_span_corruption_rate_zero_and_full(spark):
    df = spark.createDataFrame([(1, "a bb ccc")], "doc_id long, text string")
    from mapnik_vector_tile_spark.operators.textstats import (
        span_corruption_stats,
    )

    r0 = span_corruption_stats(df, rate_pct=0).collect()[0]
    assert (r0["n_dropped"], r0["n_spans"]) == (0, 0)
    assert r0["kh"] == 1 * 1 + 2 * 2 + 3 * 3
    r100 = span_corruption_stats(df, rate_pct=100).collect()[0]
    assert (r100["n_dropped"], r100["n_spans"], r100["kh"]) == (3, 1, 0)
