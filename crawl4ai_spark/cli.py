"""``crwl``-style command line for the Spark engine.

Reference surface: ``crawl4ai/cli.py`` — the ``crawl`` command
(``cli.py:950-1253``: config/filter/extraction/schema options, the
``key=value`` parser at ``cli.py:108-131``, output modes
all/json/markdown/md-fit at ``cli.py:1219-1252``) plus ``examples``.
Browser/profile/config-store subcommands (``cli.py:629-949``) belong to
the browser tier and are out of scope by design.

Spark mapping:
- the page source is explicit: ``--pages corpus.parquet`` routes the
  fetch seam through ``PagesJoinFetcher`` (offline corpora, WARC
  extracts), ``--live`` through ``UrllibFetcher`` (real HTTP). The
  reference always launches a browser; an analytics engine names its
  input.
- ``--deep-crawl bfs|dfs|best-first`` runs the frontier loop
  (``run_crawl``) with ``max_depth=3`` and ``--max-pages`` exactly like
  ``cli.py:1173-1193``; a plain crawl is the one-pass
  fetch→scrape→markdown pipeline over a single-row DataFrame.
- ``monitor WORKDIR`` renders the CrawlerMonitor dashboard for any
  run directory — the CLI face of components/crawler_monitor.py.

LLM-dependent options (``-q/--question``, ``-j/--json-extract``,
extraction type ``llm``) raise with a pointer at the adapter seam
(functions/llm_adapter.py): the sandbox ships no provider, and the CLI
must not pretend otherwise.
"""

from __future__ import annotations

import json
import os
import tempfile

import click

OUTPUT_CHOICES = ["all", "json", "markdown", "md", "markdown-fit", "md-fit"]


def parse_key_values(ctx, param, value):
    """Exact mirror of cli.py:108-131 (true/false, int, float,
    [list], {json} coercion).

    Mirrored quirk: the reference splits the whole option string on
    ',' BEFORE value parsing, so a [list] or {json} value with more
    than one element is unreachable there too ('k=[a,b]' splits into
    'k=[a' + 'b]' and aborts) — single-element lists work, and
    multi-valued config belongs in a config file."""
    if not value:
        return {}
    result = {}
    pairs = value.split(",")
    for pair in pairs:
        try:
            k, v = pair.split("=", 1)
            if v.lower() == "true":
                v = True
            elif v.lower() == "false":
                v = False
            elif v.isdigit():
                v = int(v)
            elif v.replace(".", "", 1).isdigit():
                v = float(v)
            elif v.startswith("[") and v.endswith("]"):
                v = [x.strip() for x in v[1:-1].split(",") if x.strip()]
            elif v.startswith("{") and v.endswith("}"):
                try:
                    v = json.loads(v)
                except json.JSONDecodeError:
                    raise click.BadParameter(f"Invalid JSON object: {v}")
            result[k.strip()] = v
        except ValueError:
            raise click.BadParameter(f"Invalid key=value pair: {pair}")
    return result


def load_config_file(path):
    """cli.py:133-143 mirror (YAML or JSON by extension)."""
    if not path:
        return {}
    with open(path) as f:
        if path.endswith((".yml", ".yaml")):
            import yaml

            return yaml.safe_load(f) or {}
        return json.load(f)


def _get_spark(cpus: int):
    """(spark, created): reuse a live session when one exists (e.g.
    invoked from a notebook/test harness) and never stop it — stopping
    tears down the shared SparkContext for the whole process."""
    from pyspark import SparkContext

    from .session import get_spark

    created = SparkContext._active_spark_context is None
    return get_spark(parallelism=cpus, app_name="crawl4ai_spark_cli"), created


def _fetcher(spark, pages_path, live):
    from pyspark.sql import functions as F

    from .operators.fetch import PagesJoinFetcher, UrllibFetcher

    if pages_path:
        pages = spark.read.parquet(pages_path)
        if "warc_ts" not in pages.columns:
            pages = pages.withColumn(
                "warc_ts", F.lit(None).cast("timestamp")
            )
        return PagesJoinFetcher(pages), pages
    if live:
        return UrllibFetcher(), None
    raise click.ClickException(
        "name a page source: --pages <corpus.parquet> for offline "
        "corpora, or --live for real HTTP fetches"
    )


def _row_dump(row) -> dict:
    d = row.asDict(recursive=True)
    d.pop("html", None)  # raw bytes don't belong in a JSON dump
    d.pop("body", None)
    return d


@click.group(context_settings={"help_option_names": ["-h", "--help"]})
def cli():
    """Crawl4AI-on-Spark command line."""


@cli.command("crawl")
@click.argument("url", required=True)
@click.option("--pages", "-P", type=click.Path(exists=True),
              help="Parquet pages table backing the fetch seam")
@click.option("--live", is_flag=True, default=False,
              help="Fetch over real HTTP (urllib seam)")
@click.option("--crawler-config", "-C", type=click.Path(exists=True),
              help="Crawler config file (YAML/JSON) of CrawlConfig fields")
@click.option("--filter-config", "-f", type=click.Path(exists=True),
              help="Content filter config file (type: bm25|pruning)")
@click.option("--extraction-config", "-e", type=click.Path(exists=True),
              help="Extraction strategy config file (type: json-css|json-xpath)")
@click.option("--json-extract", "-j", is_flag=False, flag_value="",
              default=None, help="LLM structured extraction (adapter seam)")
@click.option("--schema", "-s", type=click.Path(exists=True),
              help="JSON schema for extraction")
@click.option("--crawler", "-c", type=str, callback=parse_key_values,
              help="CrawlConfig overrides as key1=value1,key2=value2")
@click.option("--output", "-o", type=click.Choice(OUTPUT_CHOICES),
              default="all")
@click.option("--output-file", "-O", type=click.Path(),
              help="Output file path (default: stdout)")
@click.option("--question", "-q", help="Ask a question (adapter seam)")
@click.option("--verbose", "-v", is_flag=True)
@click.option("--deep-crawl", type=click.Choice(["bfs", "dfs", "best-first"]),
              help="Frontier loop with the given strategy")
@click.option("--max-pages", type=int, default=10,
              help="Page cap in deep crawl mode")
@click.option("--workdir", type=click.Path(),
              help="Deep-crawl run directory (default: temp; keep it to "
                   "resume / monitor)")
@click.option("--cpus", type=int, default=4, help="local[N] parallelism")
def crawl_cmd(url, pages, live, crawler_config, filter_config,
              extraction_config, json_extract, schema, crawler, output,
              output_file, question, verbose, deep_crawl, max_pages,
              workdir, cpus):
    """Crawl URL and print/export the result (cli.py:950-1253)."""
    if question is not None or json_extract is not None:
        raise click.ClickException(
            "LLM-backed options need a provider adapter "
            "(crawl4ai_spark.functions.llm_adapter); none ships in "
            "this build"
        )
    extract_conf = load_config_file(extraction_config)
    if extract_conf:
        if not extract_conf.get("type"):
            raise click.ClickException("Extraction type not specified")
        if extract_conf["type"] == "llm":
            raise click.ClickException(
                "LLM extraction needs a provider adapter "
                "(functions/llm_adapter); use json-css or json-xpath"
            )
        if extract_conf["type"] not in ("json-css", "json-xpath"):
            raise click.ClickException(
                f"Invalid extraction type: {extract_conf['type']}"
            )
        if not schema:
            raise click.ClickException(
                "structured extraction needs --schema <file>"
            )
    filter_conf = load_config_file(filter_config)
    if filter_conf and filter_conf.get("type") not in ("bm25", "pruning"):
        raise click.ClickException(
            f"Invalid filter type: {filter_conf.get('type')}"
        )

    spark, created = _get_spark(cpus)
    try:
        rows = _run(spark, url, pages, live, crawler_config, crawler,
                    deep_crawl, max_pages, workdir, filter_conf,
                    extract_conf, load_config_file(schema) if schema else None,
                    verbose, output)
        _emit(rows, output, output_file, bool(deep_crawl))
    finally:
        if created:
            spark.stop()


def _run(spark, url, pages_path, live, crawler_config, crawler_kv,
         deep_crawl, max_pages, workdir, filter_conf, extract_conf,
         schema_data, verbose, output="all"):
    from pyspark.sql import functions as F

    from .functions.scrape import scrape_stage
    from .operators.fetch import fetch_stage

    fetcher, pages_df = _fetcher(spark, pages_path, live)
    if deep_crawl:
        from .operators.frontier import CrawlConfig, CrawlRun, run_crawl

        strategy = {"bfs": "bfs", "dfs": "dfs",
                    "best-first": "best_first"}[deep_crawl]
        kwargs = dict(load_config_file(crawler_config) or {})
        kwargs.update(crawler_kv or {})
        # cli.py:1173-1193: depth 3, strategy, max_pages. The option
        # value wins unconditionally (the reference builds the strategy
        # straight from it) — it must stay coupled to max_rounds below
        kwargs.setdefault("max_depth", 3)
        kwargs["max_pages"] = max_pages
        kwargs["strategy"] = strategy
        if strategy == "best_first":
            kwargs.setdefault("batch_size", 10)
        if pages_df is None:
            kwargs["fetcher"] = fetcher
        cfg = CrawlConfig(**kwargs)
        wd = workdir or tempfile.mkdtemp(prefix="crwl_")
        run_crawl(spark, pages_df, [url], wd, cfg,
                  max_rounds=max_pages)
        if verbose:
            click.echo(f"run directory: {wd}", err=True)
        df = CrawlRun(spark, pages_df, wd, cfg).results()
        if filter_conf or (extract_conf and schema_data):
            # the results table intentionally drops html/cleaned_html
            # (RESULT_COLS); the filter/extraction stages need the DOM,
            # so re-resolve the crawled URLs through the fetch seam and
            # join the cleaned_html back (deterministic for --pages; a
            # refetch for --live — content may have changed between the
            # crawl and this pass). Only successfully-crawled rows are
            # refetched (they passed robots gating during the crawl;
            # blocked/missed rows have nothing to extract), and the
            # --live refetch paces hosts at the crawl's politeness
            # floor instead of sweeping them unthrottled.
            enrich_fetcher = fetcher
            if pages_df is None:
                from .operators.fetch import UrllibFetcher
                from .operators.politeness import BASE_DELAY

                enrich_fetcher = UrllibFetcher(host_interval=BASE_DELAY)
            enriched = scrape_stage(
                fetch_stage(
                    df.filter(F.col("success")).select("url"),
                    enrich_fetcher,
                ),
                "html", "url", markdown=False,
            ).select("url", "cleaned_html")
            df = df.join(enriched, "url", "left")
    else:
        one = spark.createDataFrame([(url,)], "url string")
        df = scrape_stage(fetch_stage(one, fetcher), "html", "url",
                          markdown=True)
    if filter_conf:
        from .functions.content_filter import fit_markdown_stage

        kind = filter_conf["type"]
        df = fit_markdown_stage(
            df, "cleaned_html", "url",
            filter_type="bm25" if kind == "bm25" else "pruning",
            user_query=filter_conf.get("query"),
            threshold=filter_conf.get("threshold", 0.48),
            bm25_threshold=filter_conf.get("threshold", 1.0),
            use_stemming=filter_conf.get("use_stemming", True),
        )
    if extract_conf and schema_data:
        from .functions.schema_extract import schema_extract_stage

        df = schema_extract_stage(
            df, "cleaned_html", schema_data,
            out_col="extracted_content",
            selector_type=(
                "xpath" if extract_conf["type"] == "json-xpath" else "css"
            ),
        )
    if deep_crawl:
        # LAST, after every join/stage: a join would destroy the sort,
        # and the first row (round 0 seed) is the "main result"
        df = df.orderBy("round", "depth", "url")
    if output != "all":
        # every other mode prints only the main (first) result — don't
        # ship a whole deep-crawl's markdown/links to the driver
        df = df.limit(1)
    return df.collect()


def _emit(rows, output, output_file, is_deep):
    """Output-mode mirror of cli.py:1219-1252 (main result = first
    row; `all` dumps every deep-crawl row)."""
    if not rows:
        click.echo("No results found during deep crawling")
        return
    main = rows[0]

    def text():
        if output == "all":
            dumped = [_row_dump(r) for r in rows]
            return json.dumps(dumped if is_deep else dumped[0], indent=2,
                              default=str)
        if output == "json":
            extracted = main["extracted_content"] if (
                "extracted_content" in main.__fields__
            ) else None
            if extracted is None:
                raise click.ClickException(
                    "-o json needs an extraction strategy "
                    "(--extraction-config + --schema)"
                )
            return json.dumps(json.loads(extracted), indent=2)
        if output in ("markdown", "md"):
            return main["raw_markdown"] or ""
        fit = (
            main["fit_markdown"] if "fit_markdown" in main.__fields__
            else None
        )
        if fit is None:
            raise click.ClickException(
                "-o md-fit needs --filter-config (bm25 or pruning)"
            )
        return fit

    body = text()
    if output_file:
        with open(output_file, "w") as f:
            f.write(body)
    else:
        click.echo(body)


@cli.command("monitor")
@click.argument("workdir", type=click.Path(exists=True))
@click.option("--cpus", type=int, default=4)
def monitor_cmd(workdir, cpus):
    """Render the crawl dashboard for a run directory."""
    from .monitor import CrawlerMonitor

    spark, created = _get_spark(cpus)
    try:
        click.echo(CrawlerMonitor(spark, workdir).render())
    finally:
        if created:
            spark.stop()


@cli.command("examples")
def examples_cmd():
    """Show usage examples (cli.py:1257-1260)."""
    click.echo(
        """Examples:

  # one page from an offline corpus, markdown out
  python -m crawl4ai_spark crawl https://h0.example.com/en/p1.html \\
      --pages corpus.parquet -o markdown

  # deep BFS crawl, 20 pages, JSON dump of every result row
  python -m crawl4ai_spark crawl https://h0.example.com/en/p1.html \\
      --pages corpus.parquet --deep-crawl bfs --max-pages 20 -o all \\
      --workdir /tmp/run1

  # live HTTP fetch with structured extraction
  python -m crawl4ai_spark crawl https://example.com --live \\
      -e extract.json -s schema.json -o json

  # fit-markdown via the pruning content filter
  python -m crawl4ai_spark crawl https://example.com --live \\
      -f filter.json -o md-fit

  # dashboard of a (running or finished) crawl directory
  python -m crawl4ai_spark monitor /tmp/run1
"""
    )


def main():
    cli()


if __name__ == "__main__":
    main()
