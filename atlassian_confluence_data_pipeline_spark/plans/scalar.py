"""Scalar-function queries (SURVEY.md §2.7, F4-F16).

The reference's scalar library is its HTML/string/date processing chain;
every light (non-DOM-structural) function maps to a built-in Spark column
expression that stays inside whole-stage codegen. The DOM-structural
rewrites (F1-F3) live in ``functions/html.py`` as pandas UDFs with golden
unit tests; here we register the built-in-expressible surface with DuckDB
oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.functions.text import (
    mime_for_filename,
    sanitize_filename,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

# ---------------------------------------------------------------------------
# F5 — filename sanitization
# ---------------------------------------------------------------------------


@query(
    "sanitize_filenames",
    oracle="""
WITH named AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 10 = 0
              THEN rpad(concat(p_name, '/', p_brand), 250, 'x')
              ELSE concat(p_name, '/', p_brand) END AS raw_name
  FROM part
)
SELECT p_partkey,
       CASE WHEN length(translate(raw_name, '<>:"/\\|?*', '_________')) > 200
            THEN concat(substr(translate(raw_name, '<>:"/\\|?*', '_________'), 1, 197), '...')
            ELSE translate(raw_name, '<>:"/\\|?*', '_________') END AS safe_name
FROM named
""",
    tags=("scalar", "string"),
)
def sanitize_filenames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filename sanitization F5 (html_generator.py:284-302): map the nine
    forbidden characters to '_' and truncate >200 chars to 197 + '...'.
    Pure `translate`/`substring` expressions — codegen'd, no UDF."""
    part = load_table(spark, sf_dir, "part")
    raw = F.when(
        F.col("p_partkey") % 10 == 0,
        F.rpad(F.concat_ws("/", "p_name", "p_brand"), 250, "x"),
    ).otherwise(F.concat_ws("/", "p_name", "p_brand"))
    return part.select(
        "p_partkey", sanitize_filename(raw).alias("safe_name")
    )


# ---------------------------------------------------------------------------
# F6 — MIME lookup with default
# ---------------------------------------------------------------------------


@query(
    "mime_types",
    oracle="""
WITH files AS (
  SELECT doc_id,
         concat('doc_', CAST(doc_id AS VARCHAR), '.',
                CASE CAST(doc_id % 6 AS INT)
                  WHEN 0 THEN 'png' WHEN 1 THEN 'jpg' WHEN 2 THEN 'pdf'
                  WHEN 3 THEN 'txt' WHEN 4 THEN 'gif' ELSE 'xyz' END) AS filename
  FROM documents
)
SELECT filename,
       CASE lower(regexp_extract(filename, '\\.([^.]+)$', 1))
         WHEN 'png' THEN 'image/png'
         WHEN 'jpg' THEN 'image/jpeg'
         WHEN 'pdf' THEN 'application/pdf'
         WHEN 'txt' THEN 'text/plain'
         WHEN 'gif' THEN 'image/gif'
         ELSE 'application/octet-stream' END AS mime
FROM files
""",
    tags=("scalar", "map"),
)
def mime_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension→MIME lookup F6 (html_generator.py:259-282): a broadcast
    map-literal `element_at` with octet-stream default, over filenames
    synthesized deterministically from doc ids."""
    docs = load_table(spark, sf_dir, "documents")
    ext = (
        F.when(F.col("doc_id") % 6 == 0, "png")
        .when(F.col("doc_id") % 6 == 1, "jpg")
        .when(F.col("doc_id") % 6 == 2, "pdf")
        .when(F.col("doc_id") % 6 == 3, "txt")
        .when(F.col("doc_id") % 6 == 4, "gif")
        .otherwise("xyz")
    )
    filename = F.concat(F.lit("doc_"), F.col("doc_id").cast("string"), F.lit("."), ext)
    return docs.select(filename.alias("filename")).select(
        "filename", mime_for_filename(F.col("filename")).alias("mime")
    )


# ---------------------------------------------------------------------------
# F11 — cookie string → map
# ---------------------------------------------------------------------------


@query(
    "cookie_parse",
    oracle="""
WITH cookies AS (
  SELECT event_id,
         concat('sid=', CAST(user_id AS VARCHAR), '; type=', event_type,
                '; seq=', CAST(event_id % 1000 AS VARCHAR)) AS cookie
  FROM events
)
SELECT event_id,
       regexp_extract(cookie, 'sid=([^;]*)', 1) AS sid,
       regexp_extract(cookie, 'type=([^;]*)', 1) AS type_val,
       regexp_extract(cookie, 'seq=([^;]*)', 1) AS seq
FROM cookies
""",
    tags=("scalar", "map", "string"),
)
def cookie_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cookie-string→map parsing F11 (secure_cookie_manager.py:205-228):
    `str_to_map(cookie, '; ', '=')` — the exact built-in the reference
    hand-rolls — then typed field extraction via element_at."""
    ev = load_table(spark, sf_dir, "events")
    cookie = F.concat(
        F.lit("sid="),
        F.col("user_id").cast("string"),
        F.lit("; type="),
        F.col("event_type"),
        F.lit("; seq="),
        (F.col("event_id") % 1000).cast("string"),
    )
    m = F.str_to_map(cookie, F.lit("; "), F.lit("="))
    return ev.select(
        "event_id",
        F.element_at(m, "sid").alias("sid"),
        F.element_at(m, "type").alias("type_val"),
        F.element_at(m, "seq").alias("seq"),
    )


# ---------------------------------------------------------------------------
# F13 — JSON extraction
# ---------------------------------------------------------------------------


@query(
    "json_props_stats",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       round(CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS DOUBLE)
             / count(json_extract_string(props, '$.k')), 4) AS avg_k
FROM events
GROUP BY 1
""",
    tags=("scalar", "json", "agg"),
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON decode F13 (state_manager.py:31-33): `get_json_object` path
    extraction on the events `props` column + grouped integer stats
    (exact integer sums — no float-order concerns)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.round(F.sum("k").cast("double") / F.count("k"), 4).alias("avg_k"),
    )


# ---------------------------------------------------------------------------
# F16 — regex extraction
# ---------------------------------------------------------------------------


@query(
    "regexp_extract_words",
    oracle="""
SELECT doc_id,
       regexp_extract(text, '^([a-z]+)', 1) AS first_word,
       regexp_extract(text, '([a-z]+)$', 1) AS last_word,
       CAST(len(regexp_extract_all(text, '[a-z]+[0-9]|value')) AS INT) AS n_hits
FROM documents
""",
    tags=("scalar", "regex"),
)
def regexp_extract_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction F16 (html_generator.py:218-229): anchored group
    extraction plus pattern-occurrence counting, all JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", "^([a-z]+)", 1).alias("first_word"),
        F.regexp_extract("text", "([a-z]+)$", 1).alias("last_word"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+[0-9]|value"), F.lit(0)))
        .cast("int")
        .alias("n_hits"),
    )


# ---------------------------------------------------------------------------
# F12 — URL construction
# ---------------------------------------------------------------------------


@query(
    "build_urls",
    oracle="""
SELECT doc_id,
       concat_ws('/', 'https://example.org/wiki', rtrim(concat(source, '///'), '/'),
                 concat(CAST(doc_id AS VARCHAR), '.html')) AS url
FROM documents
""",
    tags=("scalar", "string"),
)
def build_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL joining F12 (confluence_client.py:40-54): trailing-slash
    normalization (`rtrim`) + `concat_ws` path assembly."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat_ws(
            "/",
            F.lit("https://example.org/wiki"),
            F.rtrim(F.concat(F.col("source"), F.lit("///")), F.lit("/")),
            F.concat(F.col("doc_id").cast("string"), F.lit(".html")),
        ).alias("url"),
    )


# ---------------------------------------------------------------------------
# F7/F15 — base64 embedding + content hashing
# ---------------------------------------------------------------------------


@query(
    "content_hashes",
    oracle="""
SELECT doc_id,
       to_base64(encode(substr(text, 1, 24))) AS head_b64,
       sha256(text) AS sha,
       md5(text) AS fingerprint
FROM documents
""",
    tags=("scalar", "hash", "binary"),
)
def content_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64 data-URL payload encoding F7 (html_generator.py:241-242) and
    column hashing F15: `base64(binary)`, `sha2-256`, `md5` — all
    cross-engine-identical hex/b64 text."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.base64(F.substring("text", 1, 24).cast("binary")).alias("head_b64"),
        F.sha2(F.col("text"), 256).alias("sha"),
        F.md5(F.col("text")).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# F9/F10 — date arithmetic & formatting
# ---------------------------------------------------------------------------


@query(
    "monthly_order_stats",
    oracle="""
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       count(*) AS n_orders,
       CAST(min(o_orderkey) AS BIGINT) AS first_key,
       date_trunc('month', min(o_orderdate)) AS month_start
FROM orders
WHERE o_orderdate >= TIMESTAMP '2000-01-01'
GROUP BY 1
""",
    tags=("scalar", "date", "agg"),
)
def monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date formatting/arithmetic F9-F10 (master_script.py:279,
    logger.py:18): month bucketing via `date_format`/`date_trunc` with the
    reference's inclusive-boundary-day cutoff semantics (SURVEY §1.2)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_orderkey").cast("bigint").alias("first_key"),
        F.date_trunc("month", F.min("o_orderdate")).alias("month_start"),
    )


# ---------------------------------------------------------------------------
# F4 — template placeholder substitution
# ---------------------------------------------------------------------------


@query(
    "page_id_substitution",
    oracle="""
SELECT doc_id,
       replace(concat('<a href="/pages/PAGE_ID">', source, '</a>'),
               'PAGE_ID', CAST(doc_id AS VARCHAR)) AS html
FROM documents
""",
    tags=("scalar", "string"),
)
def page_id_substitution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGE_ID placeholder substitution F4 (html_cleaner.py:140-144 →
    html_generator.py:75): literal `replace` on a templated link."""
    docs = load_table(spark, sf_dir, "documents")
    template = F.concat(
        F.lit('<a href="/pages/PAGE_ID">'), F.col("source"), F.lit("</a>")
    )
    return docs.select(
        "doc_id",
        F.replace(template, F.lit("PAGE_ID"), F.col("doc_id").cast("string")).alias(
            "html"
        ),
    )


# ---------------------------------------------------------------------------
# F1-lite — CDATA / script stripping via built-in regexp (non-DOM subset)
# ---------------------------------------------------------------------------


@query(
    "strip_markup",
    oracle="""
WITH pages AS (
  SELECT doc_id,
         concat('<script>alert(1)</script><p>', substr(text, 1, 40),
                '</p><![CDATA[', source, ']]><style>p{}</style>') AS html
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(html, '<(script|style)[^>]*>.*?</(script|style)>', '', 'gs'),
         '<!\\[CDATA\\[|\\]\\]>', '', 'g') AS cleaned
FROM pages
""",
    tags=("scalar", "html", "regex"),
)
def strip_markup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The built-in-expressible subset of clean_html F1
    (html_cleaner.py:26-27 script/style removal, :39 CDATA strip) as
    chained `regexp_replace` — the DOM-structural rest is the pandas-UDF
    path in functions/html.py."""
    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<script>alert(1)</script><p>"),
        F.substring("text", 1, 40),
        F.lit("</p><![CDATA["),
        F.col("source"),
        F.lit("]]><style>p{}</style>"),
    )
    cleaned = F.regexp_replace(
        F.regexp_replace(html, r"(?s)<(script|style)[^>]*>.*?</(script|style)>", ""),
        r"<!\[CDATA\[|\]\]>",
        "",
    )
    return docs.select("doc_id", cleaned.alias("cleaned"))


# ---------------------------------------------------------------------------
# F7 end-to-end — attachment <img> srcs rewritten to base64 data URLs
# ---------------------------------------------------------------------------


@query(
    "embed_attachment_data_urls",
    oracle="""
WITH att AS (
  SELECT doc_id,
         concat('doc_', CAST(doc_id AS VARCHAR), '.',
                CASE CAST(doc_id % 6 AS INT)
                  WHEN 0 THEN 'png' WHEN 1 THEN 'jpg' WHEN 2 THEN 'pdf'
                  WHEN 3 THEN 'txt' WHEN 4 THEN 'gif' ELSE 'xyz' END)
           AS filename,
         CASE CAST(doc_id % 6 AS INT)
           WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
           WHEN 2 THEN 'application/pdf' WHEN 3 THEN 'text/plain'
           WHEN 4 THEN 'image/gif' ELSE 'application/octet-stream' END
           AS mime,
         text
  FROM documents
), page AS (
  SELECT doc_id, filename, mime, text,
         concat('https://example.org/wiki/download/attachments/',
                CAST(doc_id AS VARCHAR), '/', filename) AS src,
         concat('<p>Attachment: <img src="',
                'https://example.org/wiki/download/attachments/',
                CAST(doc_id AS VARCHAR), '/', filename, '"/></p>') AS html
  FROM att
), emb AS (
  SELECT doc_id, filename, mime,
         replace(html, src,
                 concat('data:', mime, ';base64,', to_base64(encode(text))))
           AS embedded
  FROM page
)
SELECT doc_id, filename, mime,
       CAST(length(embedded) AS BIGINT) AS n_chars,
       md5(embedded) AS html_md5
FROM emb
""",
    tags=("scalar", "binary", "join", "html", "pipeline"),
)
def embed_attachment_data_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 END-TO-END (the reference's _embed_images flow,
    html_generator.py:201-257): every page's HTML carries an
    ``<img src=".../download/attachments/{id}/{filename}">`` reference;
    the attachment bytes are looked up by key (J4 — the engine form of
    the reference's per-row download_attachment call), the MIME type
    resolved from the filename (F6), the payload base64-encoded into a
    ``data:{mime};base64,...`` URL (F7), and the src substring REPLACED
    inside the HTML — one declarative pass instead of the reference's
    per-tag Python loop. The output hashes the rewritten HTML so parity
    covers every byte of the embedded document.

    Scale shape: one equi-join of pages to attachments on the id key
    (1:1, co-partitioned — at 100 TB this is the shuffle join AQE
    plans; no broadcast because attachments are corpus-sized, unlike
    the tiny-dim J4 cases), then narrow string projections. base64 and
    md5 are cross-engine-identical."""
    from atlassian_confluence_data_pipeline_spark.sources.binary import (
        attachments_from_documents,
    )

    docs = load_table(spark, sf_dir, "documents")
    att = attachments_from_documents(docs).select(
        F.col("owner_id").alias("doc_id"),
        "filename",
        F.col("meta.mime").alias("mime"),
        "content",
    )
    src = F.concat(
        F.lit("https://example.org/wiki/download/attachments/"),
        F.col("doc_id").cast("string"),
        F.lit("/"),
        F.col("filename"),
    )
    page = docs.select("doc_id").join(att, "doc_id").select(
        "doc_id",
        "filename",
        "mime",
        "content",
        src.alias("src"),
        F.concat(
            F.lit('<p>Attachment: <img src="'), src, F.lit('"/></p>')
        ).alias("html"),
    )
    # Spark's base64 may emit RFC-2045 chunked output (a newline every
    # 76 chars; governed by the legacy chunkBase64String conf, which a
    # vanilla session may have either way) — strip the line breaks so
    # the payload is the canonical unchunked form every other engine
    # (and DuckDB's to_base64) produces
    durl = F.concat(
        F.lit("data:"), F.col("mime"), F.lit(";base64,"),
        F.regexp_replace(F.base64(F.col("content")), "[\\r\\n]", ""),
    )
    embedded = F.replace(F.col("html"), F.col("src"), durl)
    return page.select(
        "doc_id",
        "filename",
        "mime",
        F.length(embedded).cast("bigint").alias("n_chars"),
        F.md5(embedded.cast("binary")).alias("html_md5"),
    )


# ---------------------------------------------------------------------------
# F13+ — semi-structured VARIANT surface (Spark 4)
# ---------------------------------------------------------------------------


@query(
    "variant_props_profile",
    oracle="""
WITH v AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(k) AS BIGINT) AS n_with_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k,
       CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
FROM v GROUP BY 1
""",
    tags=("scalar", "json", "variant", "agg"),
)
def variant_props_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured profiling through Spark 4's VARIANT type: the
    JSON ``props`` column parses ONCE into a binary variant
    (``parse_json`` — the open-format semi-structured encoding Delta/
    Iceberg standardize on), and typed ``variant_get`` extractions feed
    the grouped profile. Against the reference's per-row ``json.loads``
    (state_manager.py:31-33), this is the engine path where parse cost
    is paid once per row INSIDE codegen and every later field access is
    a binary offset lookup — the semi-structured analog of column
    pruning. The oracle reads the same fields with classic JSON path
    extraction, proving the variant path is value-identical to
    string-JSON semantics."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count("k").cast("bigint").alias("n_with_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.count_distinct("k").cast("bigint").alias("n_distinct_k"),
        )
    )


# ---------------------------------------------------------------------------
# F15 — crypto roundtrip under the driver gate (round-10 VERDICT item 7)
# ---------------------------------------------------------------------------


@query(
    "fernet_roundtrip_docs",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_roundtrip_ok,
       CAST(0 AS BIGINT) AS n_mismatch
FROM documents
""",
    tags=("scalar", "crypto", "f15"),
)
def fernet_roundtrip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 under driver_sim: encrypt every document's text into a
    Fernet token (PBKDF2-derived key, spec-random IVs) and
    verify-then-decrypt it in the SAME plan — the oracle pins that the
    roundtrip loses nothing (ok == n_docs, mismatch == 0), which is
    exactly what fails if the token layout, HMAC input span, TTL
    arithmetic, or AES mode drifts. Byte-level Fernet semantics
    (tamper, TTL expiry, cross-library compatibility) stay pinned in
    tests/test_crypto_fernet.py.

    Scale shape: two narrow per-row passes (JVM aes_encrypt/aes_decrypt
    + the Arrow-batched HMAC pandas UDF) and one count aggregate — no
    shuffle beyond the final 1-row agg. Cites reference
    utilities/secure_cookie_manager.py:40-140 (save/load roundtrip)."""
    from atlassian_confluence_data_pipeline_spark.functions.crypto import (
        BASE_PASSPHRASE,
        derive_fernet_key,
        fernet_decrypt,
        fernet_encrypt,
    )

    key = derive_fernet_key(BASE_PASSPHRASE, b"fernet-roundtrip-docs")
    ts = 1_700_000_000
    docs = load_table(spark, sf_dir, "documents")
    tok = fernet_encrypt(F.encode(F.col("text"), "UTF-8"), key, ts)
    plain = fernet_decrypt(F.col("__tok"), key, now=ts + 10, ttl=3600)
    ok = F.decode(plain, "UTF-8") == F.col("text")
    return (
        docs.select("text", tok.alias("__tok"))
        .select("text", ok.alias("__ok"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("__ok"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_roundtrip_ok"),
            F.sum(F.when(F.col("__ok"), 0).otherwise(1))
            .cast("bigint")
            .alias("n_mismatch"),
        )
    )
