"""Golden in/out tests for the DOM-rewrite functions (FIXTURES.md §B
html_golden cases; reference behaviors cited per case)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.functions.html import (
    clean_html,
    make_clean_html_udf,
    process_code_blocks,
    process_images,
)

BASE = "https://example.org/wiki"


def test_script_style_removed():
    # html_cleaner.py:26-27
    assert clean_html("<script>alert(1)</script><p>x</p><style>p{}</style>") == "<p>x</p>"


def test_cdata_stripped():
    # html_cleaner.py:39
    assert clean_html("<![CDATA[raw]]><p>x</p>") == "raw<p>x</p>"


def test_ac_image_attachment_each_alignment():
    # html_cleaner.py:55-108 (alignment styles), :115-153 (attachment tagging)
    for align, style in [
        ("center", "display: block; margin-left: auto; margin-right: auto;"),
        ("right", "float: right; margin-left: 1em;"),
        ("left", "float: left; margin-right: 1em;"),
    ]:
        html = (
            f'<ac:image ac:align="{align}">'
            '<ri:attachment ri:filename="pic.png"/></ac:image>'
        )
        out = process_images(html)
        assert 'src="download/attachments/PAGE_ID/pic.png"' in out
        assert style in out


def test_ac_image_titled_becomes_figure():
    # html_cleaner.py:179-193
    html = '<ac:image ac:title="A cat"><ri:attachment ri:filename="c.png"/></ac:image>'
    out = process_images(html)
    assert out.startswith("<figure>")
    assert "<figcaption>A cat</figcaption>" in out


def test_ri_url_image():
    html = '<ac:image><ri:url ri:value="https://x/y.png"/></ac:image>'
    assert '<img src="https://x/y.png"/>' == process_images(html)


def test_relative_url_absolutized_absolute_passthrough():
    # html_cleaner.py:164-166
    out = process_images('<img src="/a/b.png"><img src="https://x/c.png">', BASE)
    assert f'src="{BASE}/a/b.png"' in out
    assert 'src="https://x/c.png"' in out
    out2 = process_images('<img src="data:image/png;base64,xyz">', BASE)
    assert 'src="data:image/png;base64,xyz"' in out2


def test_code_macro_to_pre():
    # html_cleaner.py:203-235
    html = (
        '<ac:structured-macro ac:name="code" ac:schema-version="1">'
        '<ac:parameter ac:name="language">python</ac:parameter>'
        "<ac:plain-text-body><![CDATA[print(1 < 2)]]></ac:plain-text-body>"
        "</ac:structured-macro>"
    )
    out = process_code_blocks(html)
    assert out == (
        '<pre class="code-block" data-language="python">'
        "<code>print(1 < 2)</code></pre>"
    )


def test_code_macro_no_language():
    html = (
        '<ac:structured-macro ac:name="code">'
        "<ac:plain-text-body><![CDATA[x]]></ac:plain-text-body>"
        "</ac:structured-macro>"
    )
    assert process_code_blocks(html) == '<pre class="code-block"><code>x</code></pre>'


def test_error_passthrough_and_null():
    # html_cleaner.py:42-45: any failure returns input unchanged
    assert clean_html(None) is None
    # non-string input would raise inside; the UDF maps None through


def test_full_chain():
    html = (
        "<script>s()</script>"
        '<ac:image ac:align="center"><ri:attachment ri:filename="i.png"/></ac:image>'
        '<ac:structured-macro ac:name="code">'
        "<ac:plain-text-body><![CDATA[a=1]]></ac:plain-text-body></ac:structured-macro>"
        "<![CDATA[tail]]>"
    )
    out = clean_html(html, BASE)
    assert "<script>" not in out
    # attachment src absolutized against the base (html_cleaner.py:139-144)
    assert f'src="{BASE}/download/attachments/PAGE_ID/i.png"' in out
    assert '<pre class="code-block"><code>a=1</code></pre>' in out
    assert out.endswith("tail")


def test_pandas_udf_batch(spark):
    df = spark.createDataFrame(
        [("1", "<script>x</script><p>a</p>"), ("2", None)], ["id", "html"]
    )
    out = df.select(make_clean_html_udf(BASE)(F.col("html")).alias("c")).collect()
    assert out[0]["c"] == "<p>a</p>"
    assert out[1]["c"] is None
