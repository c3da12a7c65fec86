"""Gopher-style repetition metrics (functions/repetition.py)."""

from collections import Counter

from pyspark.sql import functions as F

from crawl4ai_spark.functions.repetition import (
    repetition_metrics,
    word_lines,
    word_ngrams,
)

E6 = 10**6


def _ref_metrics(text, line_len=10, top_ns=(2, 3, 4), dup_ns=(5, 10)):
    """Pure-Python mirror with identical integer semantics."""
    ws = text.split(" ")
    out = {}
    nl_ = (len(ws) + line_len - 1) // line_len
    lines = [" ".join(ws[i * line_len:(i + 1) * line_len]) for i in range(nl_)]

    def dupf(arr):
        n, nd = len(arr), len(set(arr))
        return E6 * (n - nd) // n if n else 0

    out["dup_line_frac_e6"] = dupf(lines)
    totc = sum(len(x) for x in lines)
    distc = sum(len(x) for x in set(lines))
    out["dup_line_char_frac_e6"] = E6 * (totc - distc) // totc if totc else 0
    tc = len(text)
    for n in top_ns:
        grams = (
            [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
            if len(ws) >= n
            else []
        )
        if grams and tc:
            c = Counter(grams)
            negcnt, gm = min((-v, k) for k, v in c.items())
            out[f"top{n}gram_char_frac_e6"] = min(
                E6 * -negcnt * len(gm) // tc, E6
            )
        else:
            out[f"top{n}gram_char_frac_e6"] = 0
    for n in dup_ns:
        grams = (
            [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
            if len(ws) >= n
            else []
        )
        out[f"dup{n}gram_frac_e6"] = dupf(grams)
    return out


TEXTS = [
    "a b c d e f g h i j a b c d e f g h i j",       # two identical lines
    "x y x y x y x y x y x y",                        # dominant 2-gram
    "one two three four five six seven eight nine ten eleven twelve",
    "w w w w w w w w w w w w w w w w w w w w w w w w",  # fully degenerate
    "solo",
    "p q",                                             # below most n-gram sizes
]


def _spark_metrics(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    m = repetition_metrics(F.split(F.col("text"), " "), F.length("text"))
    rows = df.select("doc_id", *[c.alias(k) for k, c in m.items()]).collect()
    return {r["doc_id"]: {k: r[k] for k in r.asDict() if k != "doc_id"} for r in rows}


def test_metrics_match_pure_python_reference(spark):
    got = _spark_metrics(spark, TEXTS)
    for i, t in enumerate(TEXTS):
        assert got[i] == _ref_metrics(t), f"doc {i}: {t!r}"


def test_degenerate_text_saturates(spark):
    """24x the same word: every line duplicates the first, every 5-gram
    duplicates the first -> fractions approach 1e6."""
    got = _spark_metrics(spark, TEXTS)[3]
    # 24 words -> 3 lines, first two identical: (3-2)/3
    assert got["dup_line_frac_e6"] == E6 // 3
    assert got["dup5gram_frac_e6"] == E6 * 19 // 20
    # overlap-inflated count is capped at exactly 1e6
    assert got["top2gram_char_frac_e6"] == E6


def test_clean_text_scores_zero(spark):
    """All-distinct words: no repetition signal anywhere."""
    got = _spark_metrics(spark, TEXTS)[2]
    assert got["dup_line_frac_e6"] == 0
    assert got["dup_line_char_frac_e6"] == 0
    assert got["dup5gram_frac_e6"] == 0
    assert got["dup10gram_frac_e6"] == 0


def test_short_text_below_ngram_sizes(spark):
    """Fewer words than n: empty gram set -> 0, no crash."""
    got = _spark_metrics(spark, TEXTS)
    assert got[4]["top2gram_char_frac_e6"] == 0
    assert got[5]["dup5gram_frac_e6"] == 0


def test_word_lines_windows(spark):
    df = spark.createDataFrame([("a b c d e",)], "text string")
    r = df.select(
        word_lines(F.split("text", " "), line_len=2).alias("l")
    ).first()["l"]
    assert r == ["a b", "c d", "e"]


def test_word_ngrams_edges(spark):
    df = spark.createDataFrame([("a b c",)], "text string")
    r2 = df.select(word_ngrams(F.split("text", " "), 2).alias("g")).first()["g"]
    r4 = df.select(word_ngrams(F.split("text", " "), 4).alias("g")).first()["g"]
    assert r2 == ["a b", "b c"]
    assert r4 == []


def test_top_gram_tiebreak_is_order_independent(spark):
    """Every 2-gram unique -> all counts tie at 1; the winner must be
    the lexicographically smallest gram regardless of input order."""
    a = "b a d c"   # grams: 'b a','a d','d c' -> smallest 'a d'
    df = spark.createDataFrame([(a,)], "text string")
    m = repetition_metrics(F.split(F.col("text"), " "), F.length("text"))
    v = df.select(m["top2gram_char_frac_e6"].alias("v")).first()["v"]
    # count 1, len('a d')=3, tc=7 -> 1e6*3//7
    assert v == E6 * 3 // 7


def test_arrow_struct_matches_expression_form(spark):
    """The production Arrow kernel (repetition_struct) is bit-identical
    to the pure-Column form on the pinned texts AND a corpus slice."""
    from crawl4ai_spark.functions.repetition import (
        _METRIC_FIELDS,
        repetition_struct,
    )

    texts = TEXTS + [
        r.text
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        .limit(100)
        .collect()
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    expr = repetition_metrics(F.split(F.col("text"), " "), F.length("text"))
    a = df.select(
        "doc_id", *[c.alias(k) for k, c in expr.items()]
    ).orderBy("doc_id").collect()
    b = (
        df.select("doc_id", repetition_struct("text").alias("_r"))
        .select("doc_id", *[f"_r.{f}" for f in _METRIC_FIELDS])
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_python_kernel_matches_reference(spark):
    from crawl4ai_spark.functions.repetition import repetition_metrics_py

    for t in TEXTS:
        assert repetition_metrics_py(t) == _ref_metrics(t)
    assert set(repetition_metrics_py(None).values()) == {0}
