"""Vanilla-session replica: the driver's environment, reproduced.

The r4 gate regression (``pages_meta`` red) happened because every
local check ran on the repo's ``get_spark`` factory while the driver
runs the catalog on a vanilla ``SparkSession.builder.getOrCreate()``
session — so a conf dependency shipped unseen. These tests close the
CLASS of bug, not just the instance:

- a subprocess test builds a truly vanilla session (fresh JVM, no repo
  confs) and runs the conf-dependent paths through the
  ``__spark_entry__`` wrapper;
- an in-process test flips the legacy confs to their vanilla defaults
  on a ``newSession()`` and verifies the wrapper restores them.
"""

import json
import os
import subprocess
import sys

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
def test_vanilla_subprocess_runs_conf_dependent_paths(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "vanilla_session_job.py"), SF_DIR],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=str(tmp_path),  # not the repo root: imports must not rely on cwd
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["pages_meta_rows"] == 500
    # the decode layer exercised the non-whitelisted charsets
    assert "windows-1252" in out["charsets"]
    assert "utf-16le" in out["charsets"]
    assert out["fetch_html_ok"] and out["n_fetched"] == 3


def test_entry_wrapper_restores_confs_on_vanilla_like_session(spark, sf_dir):
    """In-process replica: a newSession() with the legacy confs forced
    to their Spark-4 defaults (false) must still run every conf-
    dependent catalog entry through the __spark_entry__ wrapper."""
    import __spark_entry__ as e

    s2 = spark.newSession()
    s2.conf.set("spark.sql.legacy.javaCharsets", "false")
    s2.conf.set("spark.sql.legacy.codingErrorAction", "false")
    rows = e.queries()["pages_meta"](s2, sf_dir).collect()
    assert len(rows) == 500
    assert {r["sniffed_charset"] for r in rows} >= {"windows-1252", "utf-16le"}
    # the wrapper set them back for this session
    assert s2.conf.get("spark.sql.legacy.javaCharsets") == "true"


def test_runtime_confs_match_factory_confs(spark):
    """Every conf in RUNTIME_CONFS is runtime-settable and agrees with
    what get_spark bakes in, so factory and vanilla sessions converge."""
    from crawl4ai_spark.session import RUNTIME_CONFS

    for k, v in RUNTIME_CONFS.items():
        assert spark.conf.get(k) == v
        assert spark.conf.isModifiable(k), k
