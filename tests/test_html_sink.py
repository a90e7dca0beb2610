"""Python Data Source V2 writer sink (K1 through the official commit
protocol): content parity, _SUCCESS stamping, overwrite semantics, and
all-or-nothing publication on task failure."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.sources.html_sink import register


def _df(spark, rows):
    return spark.createDataFrame(rows, "filename string, html string")


def test_write_publishes_files_and_success_marker(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "html")
    os.makedirs(out)
    rows = [(f"page_{i}.html", f"<p>body {i}</p>") for i in range(37)]
    _df(spark, rows).repartition(4).write.format("confluence_html").mode(
        "append"
    ).save(out)
    got = {
        n: open(os.path.join(out, n)).read()
        for n in os.listdir(out)
        if n.endswith(".html")
    }
    assert got == dict(rows)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not os.path.exists(os.path.join(out, "_staging"))


def test_overwrite_replaces_previous_run(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "html")
    os.makedirs(out)
    _df(spark, [("old.html", "<p>old</p>")]).write.format(
        "confluence_html"
    ).mode("append").save(out)
    _df(spark, [("new.html", "<p>new</p>")]).write.format(
        "confluence_html"
    ).mode("overwrite").save(out)
    names = {n for n in os.listdir(out) if n.endswith(".html")}
    assert names == {"new.html"}


def test_failed_job_publishes_nothing(spark, tmp_path):
    """A poison row makes one task raise AFTER other tasks staged their
    files: the commit never runs, abort sweeps staging, and the
    destination stays empty — no partial output ever visible."""
    register(spark)
    out = str(tmp_path / "html")
    os.makedirs(out)
    rows = [(f"p_{i}.html", "ok") for i in range(20)]
    rows.append(("../escape.html", "evil"))  # unsafe name -> write() raises
    with pytest.raises(Exception):
        _df(spark, rows).repartition(5).write.format("confluence_html").mode(
            "append"
        ).save(out)
    assert [n for n in os.listdir(out) if n.endswith(".html")] == []
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))


def test_failed_job_leaves_previous_run_intact(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "html")
    os.makedirs(out)
    _df(spark, [("keep.html", "<p>keep</p>")]).write.format(
        "confluence_html"
    ).mode("append").save(out)
    with pytest.raises(Exception):
        _df(spark, [("../bad.html", "x")]).write.format(
            "confluence_html"
        ).mode("overwrite").save(out)
    # the failed overwrite must not have deleted the published run
    assert open(os.path.join(out, "keep.html")).read() == "<p>keep</p>"


def test_end_to_end_from_documents(spark, sf_dir, tmp_path):
    """The reference flow: sanitized filename + rendered HTML, one file
    per row, through the official writer."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from atlassian_confluence_data_pipeline_spark.functions.text import (
        sanitize_filename,
    )

    register(spark)
    out = str(tmp_path / "docs")
    os.makedirs(out)
    docs = load_table(spark, sf_dir, "documents").limit(25)
    page = docs.select(
        F.concat(
            sanitize_filename(F.concat(F.lit("Doc "), F.col("doc_id"))),
            F.lit(".html"),
        ).alias("filename"),
        F.concat(
            F.lit("<html><body><p>"), F.substring("text", 1, 40),
            F.lit("</p></body></html>"),
        ).alias("html"),
    )
    page.write.format("confluence_html").mode("append").save(out)
    files = [n for n in os.listdir(out) if n.endswith(".html")]
    assert len(files) == 25
    assert all(open(os.path.join(out, n)).read().startswith("<html>") for n in files)


def test_duplicate_filenames_fail_commit(spark, tmp_path):
    """Two rows producing the same filename must fail the job (no silent
    last-write-wins across partitions) and publish nothing."""
    register(spark)
    out = str(tmp_path / "html")
    os.makedirs(out)
    rows = [("same.html", "a"), ("same.html", "b"), ("other.html", "c")]
    with pytest.raises(Exception, match="duplicate filename"):
        _df(spark, rows).repartition(3).write.format("confluence_html").mode(
            "append"
        ).save(out)
    assert [n for n in os.listdir(out) if n.endswith(".html")] == []
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))


def test_overwrite_spares_foreign_files(spark, tmp_path):
    """Overwrite retracts only files the sink itself published (recorded
    in _MANIFEST) — a user's unrelated file in the same directory
    survives."""
    register(spark)
    out = str(tmp_path / "html")
    os.makedirs(out)
    with open(os.path.join(out, "README.txt"), "w") as fh:
        fh.write("not ours")
    _df(spark, [("old.html", "<p>old</p>")]).write.format(
        "confluence_html"
    ).mode("append").save(out)
    _df(spark, [("new.html", "<p>new</p>")]).write.format(
        "confluence_html"
    ).mode("overwrite").save(out)
    names = {n for n in os.listdir(out) if not n.startswith("_")}
    assert names == {"new.html", "README.txt"}
    assert open(os.path.join(out, "README.txt")).read() == "not ours"


def test_append_manifest_accumulates(spark, tmp_path):
    """Append runs extend _MANIFEST, so a later overwrite retracts every
    sink-published epoch, not just the last one."""
    register(spark)
    out = str(tmp_path / "html")
    os.makedirs(out)
    _df(spark, [("a.html", "1")]).write.format("confluence_html").mode(
        "append"
    ).save(out)
    _df(spark, [("b.html", "2")]).write.format("confluence_html").mode(
        "append"
    ).save(out)
    _df(spark, [("c.html", "3")]).write.format("confluence_html").mode(
        "overwrite"
    ).save(out)
    names = {n for n in os.listdir(out) if n.endswith(".html")}
    assert names == {"c.html"}


def test_reserved_metadata_names_rejected(spark, tmp_path):
    """A row named after the sink's own metadata files (_MANIFEST,
    _SUCCESS, _staging) must fail the job — publishing it would corrupt
    overwrite-retraction bookkeeping or break the staging rename."""
    register(spark)
    for bad in ["_MANIFEST", "_SUCCESS", "_staging", "_MANIFEST.tmp"]:
        out = str(tmp_path / f"html_{bad.strip('._')}")
        os.makedirs(out)
        with pytest.raises(Exception, match="unsafe filename"):
            _df(spark, [("ok.html", "x"), (bad, "evil")]).write.format(
                "confluence_html"
            ).mode("append").save(out)
        assert [n for n in os.listdir(out) if n.endswith(".html")] == []


def test_commit_ignores_none_messages(tmp_path):
    """Speculative/failed tasks can surface as None commit messages; the
    driver commit must skip them instead of raising after every real
    task succeeded (same guard as the audit-log sink)."""
    from atlassian_confluence_data_pipeline_spark.sources.html_sink import (
        HtmlFileWriter,
        _Manifest,
    )

    out = str(tmp_path / "html")
    staging = os.path.join(out, "_staging", "t0")
    os.makedirs(staging)
    with open(os.path.join(staging, "a.html"), "w") as fh:
        fh.write("body")
    w = HtmlFileWriter({"path": out}, overwrite=False)
    w.commit([None, _Manifest(staging_dir=staging, filenames=["a.html"]), None])
    assert open(os.path.join(out, "a.html")).read() == "body"
    assert os.path.exists(os.path.join(out, "_SUCCESS"))


def test_overwrite_drops_success_before_retraction(tmp_path, monkeypatch):
    """During overwrite retraction the prior _SUCCESS marker must come
    down BEFORE any published file is removed (a concurrent reader must
    never see _SUCCESS next to a half-retracted directory), and be
    re-stamped last."""
    import atlassian_confluence_data_pipeline_spark.sources.html_sink as hs

    out = str(tmp_path / "html")
    os.makedirs(out)
    with open(os.path.join(out, "old.html"), "w") as fh:
        fh.write("old")
    with open(os.path.join(out, "_MANIFEST"), "w") as fh:
        fh.write("old.html")
    with open(os.path.join(out, "_SUCCESS"), "w") as fh:
        fh.write("")
    staging = os.path.join(out, "_staging", "t0")
    os.makedirs(staging)
    with open(os.path.join(staging, "new.html"), "w") as fh:
        fh.write("new")

    real_remove = os.remove
    order = []

    def spy_remove(path):
        order.append(os.path.basename(path))
        if os.path.basename(path) == "old.html":
            assert not os.path.exists(os.path.join(out, "_SUCCESS")), (
                "_SUCCESS still visible while retracting prior files"
            )
        real_remove(path)

    monkeypatch.setattr(hs.os, "remove", spy_remove)
    w = hs.HtmlFileWriter({"path": out}, overwrite=True)
    w.commit([hs._Manifest(staging_dir=staging, filenames=["new.html"])])
    assert order.index("_SUCCESS") < order.index("old.html")
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert open(os.path.join(out, "new.html")).read() == "new"
    assert not os.path.exists(os.path.join(out, "old.html"))
