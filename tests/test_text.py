

def test_blocklist_hits_counts_and_absence(spark):
    from crawl4ai_spark.functions.text import blocklist_hits

    df = spark.createDataFrame(
        [(1, "the big bad wolf and the big door"), (2, "clean words only")],
        ["id", "t"],
    )
    got = {r["id"]: r["h"] for r in df.select(
        "id", blocklist_hits("t", ("big", "bad")).alias("h")).collect()}
    assert got == {1: 3, 2: 0}


def test_gopher_flags_bounds(spark):
    from crawl4ai_spark.functions.text import gopher_quality_flags

    long_ok = " ".join(["word"] * 60)            # 60 words, mwl 400
    short = "tiny doc"                            # fails min_words
    longwords = " ".join(["x" * 15] * 60)         # mwl 1500 > 1000
    numeric = " ".join(["123"] * 60)              # alpha frac 0
    df = spark.createDataFrame(
        [(1, long_ok), (2, short), (3, longwords), (4, numeric), (5, "")],
        ["id", "t"],
    )
    got = {r["id"]: r["g"] for r in df.select(
        "id", gopher_quality_flags("t").alias("g")).collect()}
    assert got[1]["gopher_keep"] == 1 and got[1]["mean_word_len_e2"] == 400
    assert got[2]["gopher_keep"] == 0
    assert got[3]["gopher_keep"] == 0
    assert got[4]["gopher_keep"] == 0 and got[4]["alpha_word_frac_e6"] == 0
    assert got[5]["gopher_keep"] == 0 and got[5]["mean_word_len_e2"] == 0
