"""Subprocess body for the vanilla-session replica test.

Builds a SparkSession EXACTLY the way the correctness driver does —
``SparkSession.builder.master(...).getOrCreate()`` with none of the
repo's ``get_spark`` confs — then exercises the two code paths that
depend on runtime-settable confs (the r4 ``pages_meta`` gate regression
class):

1. the ``__spark_entry__.queries()`` wrapper for ``pages_meta`` (the
   charset sniff + tolerant decode layer), and
2. a binary-html ``PagesJoinFetcher`` crawl round (the WARC byte path
   through the fetch seam).

Prints one JSON line with the observations; exits non-zero on failure.
"""

import json
import sys


def main() -> None:
    sf_dir = sys.argv[1]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("vanilla_replica")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    # the replica must really be vanilla: neither legacy conf set
    assert spark.conf.get("spark.sql.legacy.javaCharsets") == "false"
    assert spark.conf.get("spark.sql.legacy.codingErrorAction") == "false"

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    rows = e.queries()["pages_meta"](spark, sf_dir).collect()
    charsets = {r["sniffed_charset"] for r in rows}

    from crawl4ai_spark.operators.fetch import PagesJoinFetcher
    from crawl4ai_spark.synth import generate_pages

    pages = generate_pages(spark, sf_dir)  # html is binary in synth
    assert dict(pages.dtypes)["html"] == "binary"
    out = PagesJoinFetcher(pages).fetch(pages.select("url").limit(3))
    fetched = out.collect()

    print(
        json.dumps(
            {
                "pages_meta_rows": len(rows),
                "charsets": sorted(charsets),
                "fetch_html_ok": all(
                    isinstance(r["html"], str) and r["html"].startswith("<")
                    for r in fetched
                ),
                "n_fetched": len(fetched),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
