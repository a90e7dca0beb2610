"""Session-scoped cache for expensive shared intermediates.

Several registry queries COMPOSE the same LSH dedup chains
(``near_dup_pairs_lsh``, ``simhash_pairs``, ``minhash_lsh_pairs``):
the cluster queries consume their pair tables, the agreement report
consumes two of them at once. Recomputing a full candidate-generation +
verify chain per consumer is pure waste when several consumers run in
one session (the bench, a notebook, a pipeline run) — the round-3
VERDICT flagged ``dedup_method_agreement`` for exactly this.

``shared_pair_table`` memoizes the chain's localCheckpoint per
(application, sf_dir, chain) so every consumer in a session reads the
same materialized pair table. Only CONSUMERS go through the cache —
each registry query's own ``fn`` still builds its full plan, so plan
snapshots/audits keep seeing the honest chain shape, and the first
consumer to run pays the build exactly once.

Most cached tables are pair lists (near-dup output scale, not corpus
scale); the two corpus-cardinality ones (``minhash_doc_hashes``,
``srp_fingerprints``) carry only narrow id + hash columns. At most
|sf_dirs| x |chains| entries live per session.

Cross-session warm start (round-7 item 8): every built stage is also
persisted as parquet under ``spark-warehouse/_chain_cache/`` keyed by a
FIXTURE FINGERPRINT (sha256 of every source parquet's name, size and
mtime under the sf_dir, plus a builder-version constant). A fresh
session — the driver's bench is one — reads the persisted stage back
instead of rebuilding the fold/banding chain. The cache is invisible to
correctness by construction: any change to the fixture files or to a
builder (bump ``_CHAIN_VERSION``) changes the fingerprint and forces a
rebuild; ``SPARK_GRAFT_NO_CHAIN_CACHE=1`` disables the disk layer
entirely (tools/driver_sim.py correctness runs exercise both paths).
Writes are atomic (tmp dir + rename) so concurrent sessions never see
a partial stage; losers of the rename race read the winner's copy.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_PAIR_CACHE: dict[tuple[str, str, str], DataFrame] = {}

# Manual escape hatch on top of the automatic code fingerprint below —
# bump only for semantic changes that live OUTSIDE the _CODE_DEP
# modules (e.g. a constants module reshuffle).
_CHAIN_VERSION = "v2"

#: modules whose source defines the SEMANTICS of every chain routed
#: through shared_pair_table. Their bytes are hashed into the fixture
#: fingerprint, so editing a builder or one of its helpers orphans the
#: persisted stages automatically (round-9 ADVICE: _CHAIN_VERSION was
#: correctness-by-discipline). Over-invalidation is safe (a rebuild);
#: under-invalidation is the bug — keep this list generous.
_CODE_DEPS = (
    "_cache.py",
    "../operators/graph.py",  # CC feeds persisted component stages
    "../operators/lsh.py",
    "../operators/similarity.py",
    "../operators/windows.py",  # distributed prefix feeds packed_doc_prefix
    "../functions/text.py",
    "../functions/imaging.py",
    "../functions/audio.py",
    "../sources/binary.py",
    "textops.py",
    "substring.py",
    "embeddings2.py",  # PQ codebook/code/LUT kernels (round 11 opt)
    "quantization.py",  # ADC query-count constant feeds pq_query_luts
    "clustering.py",  # dbscan thresholds feed its staged components
    "curation.py",  # survivor-gate thresholds + pair-stage builders
    "governance.py",  # entity-resolution pair stage (round 11)
    "packing.py",  # packed_doc_prefix stage builder
    "multimodal.py",
    "multimodal2.py",
    "multimodal3.py",
    "multimodal4.py",
)

_CODE_FP_CACHE: list[str] = []

_FP_CACHE: dict[tuple[str, int], str] = {}


def _code_fingerprint() -> str:
    """sha256 over the source bytes of every _CODE_DEPS module (plus
    ``_CHAIN_VERSION``), memoized per-process — source files don't
    change under a running interpreter we'd trust anyway."""
    if _CODE_FP_CACHE:
        return _CODE_FP_CACHE[0]
    h = hashlib.sha256(_CHAIN_VERSION.encode())
    here = Path(__file__).resolve().parent
    for rel in _CODE_DEPS:
        p = (here / rel).resolve()
        try:
            h.update(p.read_bytes())
        except OSError:
            h.update(f"missing:{rel}".encode())
    digest = h.hexdigest()[:12]
    _CODE_FP_CACHE.append(digest)
    return digest


def _fixture_fingerprint(sf_dir: str) -> str:
    """sha256 over (relative name, size, mtime_ns) of every parquet
    file under ``sf_dir`` plus the chain CODE fingerprint. Any
    regenerated/edited fixture or edited builder module changes the
    digest. Memoized per-process keyed by the full rglob stat profile
    (name, size, mtime_ns per file) — NOT just the root mtime, which a
    regeneration inside a nested subdir leaves unchanged (round-9/10
    ADVICE). The walk IS the digest's input, so the memo only skips the
    redundant sha256, but it keeps the memo-hit test semantics honest:
    any in-place file rewrite falls out of the memo."""
    root = Path(sf_dir)
    lines = []
    for p in sorted(root.rglob("*.parquet")):
        try:
            st = p.stat()
        except OSError:
            continue
        lines.append(f"{p.relative_to(root)}|{st.st_size}|{st.st_mtime_ns}\n")
    memo_key = (sf_dir, hash(tuple(lines)))
    cached = _FP_CACHE.get(memo_key)
    if cached is not None:
        return cached
    h = hashlib.sha256(_code_fingerprint().encode())
    for line in lines:
        h.update(line.encode())
    digest = h.hexdigest()[:16]
    _FP_CACHE[memo_key] = digest
    return digest


def _chain_cache_root() -> Path:
    # Anchored to the repo root via __file__, not cwd — the bench and
    # the driver launch from different working directories.
    return (
        Path(__file__).resolve().parents[2]
        / "spark-warehouse"
        / "_chain_cache"
    )


def _path_key(sf_dir: str) -> str:
    """Short digest of the ABSOLUTE sf_dir path — the reap/eviction
    identity. Two fixture roots that happen to share a basename (two
    checkouts both holding an 'sf0.1') get disjoint keys, so neither
    can ever reap the other's warm cache (round-9 ADVICE)."""
    resolved = str(Path(sf_dir).resolve())
    return hashlib.sha256(resolved.encode()).hexdigest()[:8]


def _disk_dir(sf_dir: str, name: str) -> Path:
    base = Path(sf_dir).name or "root"
    return (
        _chain_cache_root()
        / f"{base}-{_path_key(sf_dir)}-{_fixture_fingerprint(sf_dir)}"
        / name
    )


#: leftovers younger than this are presumed to belong to a live
#: concurrent session and are never reaped (the state.py grace-period
#: lesson: unconditional reaping can delete an in-flight write)
_REAP_GRACE_SECONDS = 3600.0


def _reap_stale(entry_dir: Path) -> None:
    """Best-effort crash hygiene, age-gated: drop (a) `.tmp-*` staging
    dirs from crashed writes inside this fingerprint's dir, and (b)
    sibling fingerprint dirs for the SAME sf_dir identity orphaned by a
    fixture regeneration or a builder-code change — both otherwise
    accumulate forever on long-lived hosts.

    Siblings are matched on the full `{base}-{pathkey}-` prefix (the
    hash of the absolute sf_dir path), never on basename alone: a
    different fixture root that shares the basename is a different
    identity and is left untouched (round-9 ADVICE — basename matching
    let two same-named roots perpetually evict each other, and could
    rmtree a dir another live session was reading). Reads touch the
    fingerprint dir's mtime (see shared_pair_table), so an actively
    read same-identity dir — e.g. a long-lived session still on the
    pre-regeneration fingerprint — stays inside the grace window."""
    import time

    now = time.time()

    def old(p: Path) -> bool:
        try:
            return now - p.stat().st_mtime > _REAP_GRACE_SECONDS
        except OSError:
            return False

    try:
        for p in entry_dir.parent.iterdir():
            if p.name.startswith(".tmp-") and old(p):
                shutil.rmtree(p, ignore_errors=True)
        import re

        root = entry_dir.parent.parent
        prefix = entry_dir.parent.name.rsplit("-", 1)[0] + "-"
        # pre-round-9 dirs lack the 8-hex path key; reap them ONLY when
        # they share this entry's sf_dir basename (`{base}-…`) — a
        # still-running old-format session on a DIFFERENT fixture root
        # must never lose its warm cache to us (round-10 ADVICE). The
        # age gate still applies on top.
        legacy = re.compile(r"-[0-9a-f]{16}$")
        current = re.compile(r"-[0-9a-f]{8}-[0-9a-f]{16}$")
        base_prefix = current.sub("", entry_dir.parent.name) + "-"
        for p in root.iterdir():
            if not (p.is_dir() and p != entry_dir.parent and old(p)):
                continue
            if p.name.startswith(prefix) or (
                p.name.startswith(base_prefix)
                and legacy.search(p.name)
                and not current.search(p.name)
            ):
                shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass


def _touch(p: Path) -> None:
    """Advance a cache dir's mtime on READ — directory mtimes don't
    move on reads by themselves, and the reaper's grace window keys on
    mtime, so in-use entries must be refreshed explicitly."""
    try:
        os.utime(p)
    except OSError:
        pass


def _persist_stage(df: DataFrame, target: Path) -> DataFrame | None:
    """Best-effort atomic parquet persist of a built stage; returns the
    re-read frame on success, None on any failure (read-only disk, race
    lost to a concurrent session, ...). Failures degrade to the
    in-memory checkpoint — never to an error."""
    tmp = target.parent / f".tmp-{uuid.uuid4().hex}"
    try:
        target.parent.mkdir(parents=True, exist_ok=True)
        df.write.mode("overwrite").parquet(str(tmp))
        try:
            os.rename(tmp, target)
        except OSError:
            # a concurrent session committed first — use its copy
            shutil.rmtree(tmp, ignore_errors=True)
        _reap_stale(target)
        spark = df.sparkSession
        return spark.read.parquet(str(target))
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)
        return None


def shared_pair_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    builder: Callable[[SparkSession, str], DataFrame],
) -> DataFrame:
    """Memoized shared stage: in-session via an eager localCheckpoint,
    cross-session via a fingerprint-keyed parquet copy on disk.

    Session layer keyed by (applicationId, sf_dir, name): a restarted
    session gets a fresh entry (checkpointed RDDs die with their
    context) and falls through to the disk layer."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _PAIR_CACHE.get(key)
    if df is not None:
        return df
    use_disk = os.environ.get("SPARK_GRAFT_NO_CHAIN_CACHE", "") != "1"
    disk = _disk_dir(sf_dir, name) if use_disk else None
    if disk is not None and (disk / "_SUCCESS").exists():
        df = spark.read.parquet(str(disk))
        _touch(disk.parent)  # keep the in-use dir inside the reap grace
    else:
        df = builder(spark, sf_dir).localCheckpoint(eager=True)
        if disk is not None:
            df = _persist_stage(df, disk) or df
    _PAIR_CACHE[key] = df
    return df


def srp_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized SRP fingerprint frame ``(vec_id, simhash)`` over
    the embeddings table — the stage every embedding-LSH consumer
    (``embedding_lsh_pairs``, ``dbscan_embedding_clusters``,
    ``knn_graph_lsh``, ``hard_negative_mining``) starts from. The frame
    is corpus-cardinality but two narrow columns (id + one bigint), so
    the checkpoint is cheap relative to re-running the 64-fold
    hyperplane projection per consumer (round-5 VERDICT: the top-4
    bench costs each rebuilt this chain, ~20 s of the 216 s wall)."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from atlassian_confluence_data_pipeline_spark.operators.lsh import (
        with_srp_fingerprint,
    )

    def _build(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        return with_srp_fingerprint(
            emb.select("vec_id", "embedding"), "embedding"
        ).select("vec_id", "simhash")

    return shared_pair_table(spark, sf_dir, "srp_fingerprints", _build)


def srp_candidates(
    spark: SparkSession, sf_dir: str, max_hamming: int, chunks: int
) -> DataFrame:
    """Session-memoized SRP banding-candidate pairs ``(id_a, id_b)`` at
    a given (max_hamming, chunks) config, built on the shared
    fingerprint frame. All four embedding-LSH consumers currently run at
    (26, 8), so they share ONE entry; a consumer that diverges its
    config gets its own keyed entry automatically."""
    from atlassian_confluence_data_pipeline_spark.operators.lsh import (
        simhash_near_pairs,
    )

    def _build(spark: SparkSession, sf_dir: str) -> DataFrame:
        return simhash_near_pairs(
            srp_fingerprints(spark, sf_dir),
            "vec_id",
            max_hamming=max_hamming,
            chunks=chunks,
        )

    return shared_pair_table(
        spark, sf_dir, f"srp_candidates_h{max_hamming}c{chunks}", _build
    )


def minhash_doc_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized MinHash base frame ``(doc_id, hs)`` over the
    documents table: per-word rolling-hash fold -> 3-gram shingle-HASH
    combine — the stage that ``minhash_lsh_pairs``, ``near_dup_pairs_lsh``
    and ``minhash_estimate_calibration`` each rebuilt per run (round-6
    item 2; the SRP chain got the same treatment in round 6).
    Checkpointed UNFILTERED; consumers apply the post-materialization
    ``size(hs) > 0`` guard themselves (filtering before the checkpoint
    re-inlines the fold — the textops PERF contract).

    Hash column ONLY (doc_id + array<bigint>): the true string shingles
    are ~3x the text size and only the Jaccard-verify consumer needs
    them — they live in the separately-keyed ``minhash_doc_shingles``
    frame so sessions that never verify never pin them (round-7 ADVICE)."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from atlassian_confluence_data_pipeline_spark.functions.text import (
        rolling_hash,
    )
    from atlassian_confluence_data_pipeline_spark.operators.lsh import (
        shingle_hashes_from_word_hashes,
    )
    from atlassian_confluence_data_pipeline_spark.plans.textops import (
        _words,
    )
    from pyspark.sql import functions as F

    def _build(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return (
            docs.select("doc_id", _words(F.col("text")).alias("w"))
            .select("doc_id", F.transform(F.col("w"), rolling_hash).alias("wh"))
            .select(
                "doc_id",
                shingle_hashes_from_word_hashes(F.col("wh")).alias("hs"),
            )
        )

    return shared_pair_table(spark, sf_dir, "minhash_doc_hashes", _build)


def minhash_doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized ``(doc_id, sh)`` true string-shingle frame — the
    wide verify-side companion of ``minhash_doc_hashes``. Built on
    demand under its OWN cache key so only sessions that run a
    string-Jaccard verify (``near_dup_pairs_lsh``) ever materialize or
    pin the ~3x-text-size shingle arrays (round-7 ADVICE: the combined
    base frame made every hs-only consumer carry this column)."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from atlassian_confluence_data_pipeline_spark.plans.textops import (
        _shingles,
        _words,
    )
    from pyspark.sql import functions as F

    def _build(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return docs.select(
            "doc_id", _shingles(_words(F.col("text"))).alias("sh")
        )

    return shared_pair_table(spark, sf_dir, "minhash_doc_shingles", _build)


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized ``(doc_id, sig)`` MinHash signature frame:
    explode of the shared shingle hashes -> ONE HashAggregate with k
    ``min`` slots (the minhash_lsh_candidates construction, identical
    values). Shared by the banded-candidate stage and the estimator
    calibration (which reads the raw signature arrays)."""
    from atlassian_confluence_data_pipeline_spark.functions.text import (
        ROLLING_MOD,
    )
    from atlassian_confluence_data_pipeline_spark.operators.lsh import (
        MINHASH_PERMS,
    )
    from atlassian_confluence_data_pipeline_spark.plans.multimodal import (
        MINHASH_K,
    )
    from pyspark.sql import functions as F

    def _build(spark: SparkSession, sf_dir: str) -> DataFrame:
        base = minhash_doc_hashes(spark, sf_dir).filter(F.size("hs") > 0)
        ex = base.select("doc_id", F.explode("hs").alias("__h"))
        mins = [
            F.min((F.lit(a) * F.col("__h") + F.lit(b)) % ROLLING_MOD).alias(
                f"__m{i}"
            )
            for i, (a, b) in enumerate(MINHASH_PERMS[:MINHASH_K])
        ]
        return (
            ex.groupBy("doc_id")
            .agg(*mins)
            .select(
                "doc_id",
                F.array(*[F.col(f"__m{i}") for i in range(MINHASH_K)]).alias(
                    "sig"
                ),
            )
        )

    return shared_pair_table(spark, sf_dir, "minhash_signatures", _build)


def minhash_band_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized banded-LSH candidate pairs ``(id_a, id_b)``
    (id_a < id_b, distinct) from the shared signature frame — the
    equi-join stage every MinHash consumer funnels through."""
    from atlassian_confluence_data_pipeline_spark.operators.lsh import (
        lsh_band_keys,
    )
    from atlassian_confluence_data_pipeline_spark.plans.multimodal import (
        MINHASH_BANDS,
        MINHASH_K,
    )
    from pyspark.sql import functions as F

    def _build(spark: SparkSession, sf_dir: str) -> DataFrame:
        sig = minhash_signatures(spark, sf_dir)
        rows = MINHASH_K // MINHASH_BANDS
        keys = lsh_band_keys(F.col("sig"), MINHASH_BANDS, rows)
        banded = sig.select(
            "doc_id", F.explode(F.array(*keys)).alias("band_key")
        )
        return (
            banded.select(F.col("doc_id").alias("id_a"), "band_key")
            .join(
                banded.select(F.col("doc_id").alias("id_b"), "band_key"),
                "band_key",
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )

    return shared_pair_table(spark, sf_dir, "minhash_band_candidates", _build)


def srp_candidate_cosines(
    spark: SparkSession, sf_dir: str, max_hamming: int, chunks: int
) -> DataFrame:
    """Session-memoized EXACT-cosine verification of the shared SRP
    banding candidates: ``(id_a, id_b, cos)`` with the house fold
    (element-ordered dot / norm product — bit-identical whichever side
    is 'a', since IEEE multiply commutes). dbscan (eps-ball filter),
    knn_graph_lsh (per-source ranks) and hard_negative_mining
    (label-split ranks) all verified the same candidates at the same
    fold before consuming them differently (round-6 item 6)."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from atlassian_confluence_data_pipeline_spark.operators.similarity import (
        dot,
        l2_norm,
    )
    from pyspark.sql import functions as F

    def _build(spark: SparkSession, sf_dir: str) -> DataFrame:
        cand = srp_candidates(spark, sf_dir, max_hamming, chunks)
        emb = load_table(spark, sf_dir, "embeddings")
        wn = emb.select(
            "vec_id",
            F.col("embedding").alias("v"),
            l2_norm(F.col("embedding")).alias("nrm"),
        )
        va = wn.select(
            F.col("vec_id").alias("id_a"),
            F.col("v").alias("va"),
            F.col("nrm").alias("na"),
        )
        vb = wn.select(
            F.col("vec_id").alias("id_b"),
            F.col("v").alias("vb"),
            F.col("nrm").alias("nb"),
        )
        cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        return (
            cand.join(va, "id_a")
            .join(vb, "id_b")
            .select("id_a", "id_b", cos.alias("cos"))
        )

    return shared_pair_table(
        spark, sf_dir, f"srp_cosines_h{max_hamming}c{chunks}", _build
    )


# ---------------------------------------------------------------------------
# Perceptual fingerprint stages (round-9 VERDICT item 1): the video /
# image / audio chains each re-paid a ~1-3.5 s encode + decode +
# fingerprint mapInPandas pass per cold session — the entire top of the
# round-8 bench profile. Persist the narrow per-modality fingerprint
# tables under the fingerprint-keyed disk cache; codec-constant changes
# rotate the key via the _CODE_DEPS code fingerprint (imaging.py,
# audio.py, binary.py, multimodal*.py are all hashed in).
# ---------------------------------------------------------------------------


def image_dhash_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared ``(doc_id, dhash)`` perceptual-hash frame over the
    textured image fixtures — the stage image_dhash_fingerprints,
    image_near_dup_pairs, dhash_hamming_fidelity and
    perceptual_modality_agreement each rebuilt per session (encode +
    decode + 9x8 resample + 64-bit pack, one mapInPandas pass)."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from atlassian_confluence_data_pipeline_spark.sources.binary import (
        dhash_images,
        textured_image_attachments_from_documents,
    )
    from pyspark.sql import functions as F

    def _build(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        fp = dhash_images(textured_image_attachments_from_documents(docs))
        return fp.select(F.col("owner_id").alias("doc_id"), "dhash")

    return shared_pair_table(spark, sf_dir, "perc_image_dhash", _build)


def image_pixel_rasters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared ``(doc_id, px)`` decoded-raster frame (768 ints per image)
    — the exact-L1 verify side of dhash_hamming_fidelity. Wider than
    the fingerprint frames but still ~6 KB/row; cached under its own
    key so fingerprint-only sessions never pin it."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from atlassian_confluence_data_pipeline_spark.sources.binary import (
        decode_image,
        textured_image_attachments_from_documents,
    )
    from pyspark.sql import functions as F

    def _build(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        att = textured_image_attachments_from_documents(docs)
        return decode_image(att).select(
            F.col("owner_id").alias("doc_id"), F.col("pixels").alias("px")
        )

    return shared_pair_table(spark, sf_dir, "perc_image_pixels", _build)


def audio_fp64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared ``(doc_id, afp)`` energy-envelope fingerprint frame over
    the WAV fixtures — consumed by audio_fingerprints,
    audio_near_dup_pairs, afp_hamming_fidelity and
    perceptual_modality_agreement."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from atlassian_confluence_data_pipeline_spark.sources.binary import (
        audio_attachments_from_documents,
        fingerprint_audio,
    )
    from pyspark.sql import functions as F

    def _build(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        fp = fingerprint_audio(audio_attachments_from_documents(docs))
        return fp.select(F.col("owner_id").alias("doc_id"), "afp")

    return shared_pair_table(spark, sf_dir, "perc_audio_fp", _build)


def audio_envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared ``(doc_id, env)`` window-energy envelope frame (65
    bigints per track) — the exact-L1 verify side of
    afp_hamming_fidelity, under its own key like the image rasters."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from atlassian_confluence_data_pipeline_spark.sources.binary import (
        audio_attachments_from_documents,
        audio_window_energies,
    )
    from pyspark.sql import functions as F

    def _build(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        att = audio_attachments_from_documents(docs)
        return audio_window_energies(att).select(
            F.col("owner_id").alias("doc_id"), "env"
        )

    return shared_pair_table(spark, sf_dir, "perc_audio_env", _build)


def video_frame_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared ``(doc_id, frame_index, fh)`` per-frame dHash frame over
    the concatenated-BMP video fixtures — the single most expensive
    cold stage in the round-8 bench (video_near_dup_pairs 3.50 s +
    video_frame_fingerprints 3.33 s, each re-running the container
    split + per-frame decode + dHash pass)."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from atlassian_confluence_data_pipeline_spark.sources.binary import (
        dhash_video_frames,
        textured_video_attachments_from_documents,
    )
    from pyspark.sql import functions as F

    def _build(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        fp = dhash_video_frames(textured_video_attachments_from_documents(docs))
        return fp.select(
            F.col("owner_id").alias("doc_id"), "frame_index", "fh"
        )

    return shared_pair_table(spark, sf_dir, "perc_video_frames", _build)


def text_simhash_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared ``(doc_id, simhash)`` 64-bit text SimHash frame — the
    explode + 64-affine-vote HashAggregate that dominated
    ``simhash_pairs``' cold cost (2.7 s of its 2.7 s at sf0.1; the
    chunk-banded candidate join downstream is cheap). Same fold as the
    oracle's symbolic rendering; warm sessions read the persisted
    fingerprint table."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from atlassian_confluence_data_pipeline_spark.operators.lsh import simhash
    from atlassian_confluence_data_pipeline_spark.plans.textops import _words
    from pyspark.sql import functions as F

    def _build(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        toks = docs.select("doc_id", _words(F.col("text")).alias("toks"))
        return simhash(toks, "doc_id", "toks")

    return shared_pair_table(spark, sf_dir, "text_simhash_fp", _build)


def pq_code_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized PQ code table ``(vec_id, code0..codeS)`` — the
    corpus-as-4-bytes-per-vector index every ADC consumer starts from
    (``pq_adc_search``, ``pq_adc_topk``, ``pq_adc_recall``). The
    encode stage is ~512 literal squared-diff terms per row; its cost
    at bench scale is Catalyst + codegen of that expression tree,
    re-paid by every consumer that inlines it (round-11 profile:
    ~0.9 s per build, three builds per bench sweep). One narrow staged
    table (id + S tiny longs) drops that to one build per session."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F

    def _build(spark: SparkSession, sf_dir: str) -> DataFrame:
        from atlassian_confluence_data_pipeline_spark.plans.embeddings2 import (
            pq_code_columns,
            pq_collect_codebook,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        cents = pq_collect_codebook(emb)
        dist_cols, code_cols = pq_code_columns(cents)
        return emb.select("vec_id", *dist_cols).select("vec_id", *code_cols)

    return shared_pair_table(spark, sf_dir, "pq_codes", _build)


def pq_query_luts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized per-query ADC lookup tables ``(query_id,
    lut0..lutS)`` — one CODEBOOK-slot array of exact squared subspace
    distances per subspace for each of the fixed query rows. Same
    literal-expression-planning cost profile as :func:`pq_code_table`,
    shared by the three ADC consumers."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F

    def _build(spark: SparkSession, sf_dir: str) -> DataFrame:
        from atlassian_confluence_data_pipeline_spark.plans.embeddings2 import (
            _CODEBOOK,
            _SUBS,
            pq_collect_codebook,
            pq_subdist_sql_spark,
        )
        from atlassian_confluence_data_pipeline_spark.plans.quantization import (
            ADC_QUERIES,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        cents = pq_collect_codebook(emb)
        lut_cols = [
            F.array(
                *[
                    F.expr(pq_subdist_sql_spark(cents, s, cid, "embedding"))
                    for cid in range(_CODEBOOK)
                ]
            ).alias(f"lut{s}")
            for s in range(_SUBS)
        ]
        return emb.filter(F.col("vec_id") < ADC_QUERIES).select(
            F.col("vec_id").alias("query_id"), *lut_cols
        )

    return shared_pair_table(spark, sf_dir, "pq_query_luts", _build)
