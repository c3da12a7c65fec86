"""Deterministic synthetic web corpus: the ``pages`` table.

Shape per BASELINE input_hint: ``pages(url string, warc_ts timestamp,
html binary, text string, lang string)`` — Common-Crawl-style. Derived
100% from the driver-generated ``documents`` table (no external data,
no RNG): every page attribute is arithmetic on ``doc_id``, so tests can
compute the link graph analytically and the crawl engine's visited sets
are reproducible.

Corpus properties engineered for the engine:
- **host skew**: 75% of pages live on host ``h0`` (Zipf-ish hot host),
  the rest spread over 31 hosts — exercises salted repartition +
  politeness budgets.
- **link graph**: 6 deterministic intra-corpus outlinks per page
  (``(doc_id*31 + j*97 + 7) % n``), one external link, one image —
  exercises link harvest, internal/external split, the seen-filter
  anti-join, and multi-round BFS expansion.
- **HTML variety**: headings, paragraphs, nav, lists, tables, pre
  blocks, blockquotes, emphasis — every construct byte-pinned in the
  markdown golden tests.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_OUTLINKS = 6
EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)


def page_host(doc_id: int) -> str:
    """~78% of pages on h0; the rest over {h4, h8, ..., h28} (doc_id
    divisible by 4 restricts doc_id % 32 to multiples of 4, and
    doc_id % 32 == 0 lands on h0 as well) — a skewed 8-host layout.
    NB: this layout is BAKED into every gate oracle and the recorded
    bench trajectory; do not redistribute it. ssl_cert.generate_certs
    stamps CN h{doc_id % 32} independently of this function, so cert
    CN != page host for most docs (certs are a standalone surface,
    never joined to pages by host)."""
    return "h%d" % (doc_id % 32 if doc_id % 4 == 0 else 0)


def page_url(doc_id: int, lang: str) -> str:
    return f"https://{page_host(doc_id)}.example.com/{lang}/p{doc_id}.html"


def outlink_targets(doc_id: int, n_docs: int) -> list[int]:
    return [(doc_id * 31 + j * 97 + 7) % n_docs for j in range(N_OUTLINKS)]


def external_url(doc_id: int) -> str:
    return f"https://ext{doc_id % 5}.other.net/page{doc_id % 11}"


def render_html(doc_id: int, text: str, lang: str, n_docs: int,
                target_urls: list[str]) -> str:
    """Deterministic page body. Uses only constructs with byte-pinned
    markdown conversion."""
    words = text.split(" ")
    title = f"Doc {doc_id}: " + " ".join(words[:3])
    desc = " ".join(words[:8])
    paras = []
    step = max(len(words) // 3, 1)
    for i in range(0, min(len(words), 3 * step), step):
        paras.append(" ".join(words[i : i + step]))

    nav = " | ".join(
        f'<a href="{u}">link {j}</a>' for j, u in enumerate(target_urls[:3])
    )
    items = "".join(
        f'<li><a href="{u}" title="target {j}">item {j}</a></li>'
        for j, u in enumerate(target_urls[3:])
    )
    body = [f"<nav>{nav}</nav>", f"<h1>{title}</h1>"]
    for i, p in enumerate(paras):
        if i == 1 and doc_id % 3 == 0:
            body.append(f"<p>{p} <strong>key</strong> section</p>")
        else:
            body.append(f"<p>{p}</p>")
    body.append(f"<ul>{items}</ul>")
    body.append(
        f'<p>External: <a href="{external_url(doc_id)}">partner {doc_id % 5}</a></p>'
    )
    body.append(f'<img src="/static/img{doc_id % 7}.png" alt="figure {doc_id % 7}">')
    if doc_id % 5 == 0:
        body.append(
            "<table><tr><th>k</th><th>v</th></tr>"
            f"<tr><td>id</td><td>{doc_id}</td></tr>"
            f"<tr><td>lang</td><td>{lang}</td></tr></table>"
        )
    if doc_id % 7 == 0:
        body.append(f"<pre>value = {doc_id}\nlang = '{lang}'</pre>")
    if doc_id % 11 == 0:
        body.append(f"<blockquote>{' '.join(words[:5])}</blockquote>")
    body.append("<script>var tracker = 1;</script>")
    return (
        "<html><head>"
        f"<title>{title}</title>"
        f'<meta name="description" content="{desc}">'
        f'<meta property="og:title" content="{title}">'
        f'<meta name="lang" content="{lang}">'
        "</head><body>"
        + "".join(body)
        + "</body></html>"
    )


def generate_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the pages table from ``{sf_dir}/documents.parquet``.

    Plan shape: one narrow projection for URLs, one aggregated self-join
    to resolve outlink target URLs (single shuffle), one mapInPandas to
    render HTML (narrow, Arrow-batched).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    d = F.col("doc_id")
    host = F.concat(
        F.lit("h"),
        F.when(d % 4 == 0, (d % 32)).otherwise(F.lit(0)).cast("string"),
    )
    url = F.concat(
        F.lit("https://"), host, F.lit(".example.com/"), F.col("lang"),
        F.lit("/p"), d.cast("string"), F.lit(".html"),
    )
    base = docs.select(
        "doc_id", "text", "lang", url.alias("url"),
        F.timestamp_seconds(F.lit(EPOCH.timestamp()).cast("long") + d).alias("warc_ts"),
    )

    # resolve outlink target urls: explode j -> arithmetic target id ->
    # join back on doc_id (one shuffle), re-aggregate ordered by j
    tgt = base.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(N_OUTLINKS - 1))).alias("j"),
    ).withColumn("target_id", (d * 31 + F.col("j") * 97 + 7) % F.lit(n_docs))
    resolved = (
        tgt.join(
            base.select(F.col("doc_id").alias("target_id"), F.col("url").alias("target_url")),
            "target_id",
        )
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("j", "target_url"))).alias("_ts"))
        .select("doc_id", F.col("_ts.target_url").alias("target_urls"))
    )
    staged = base.join(resolved, "doc_id")

    out_ddl = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    )

    def render(batches):
        import pandas as pd

        for pdf in batches:
            htmls = [
                render_html(int(i), t, lg, n_docs, list(tu)).encode("utf-8")
                for i, t, lg, tu in zip(
                    pdf["doc_id"], pdf["text"], pdf["lang"], pdf["target_urls"]
                )
            ]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "warc_ts": pdf["warc_ts"],
                    "html": htmls,
                    "text": pdf["text"],
                    "lang": pdf["lang"],
                }
            )

    return staged.mapInPandas(render, schema=out_ddl)


def write_pages(spark: SparkSession, sf_dir: str, out_path: str) -> str:
    """Materialize the pages table as parquet; returns the path."""
    generate_pages(spark, sf_dir).write.mode("overwrite").parquet(out_path)
    return out_path
