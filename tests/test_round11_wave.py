"""Round-11 wave invariants: the learned-BPE -> packing composition,
the PQ-ADC production/audit split, cluster-level modality agreement,
and streaming DPO pairs as they land."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from tests.test_round10_wave import _mk_docs, _ref_bpe

SF = "/root/testdata/sf0.001"


def _ws_count(t: str) -> int:
    # the pack_sequences whitespace convention: split(trim(text)) with
    # empties KEPT (an empty doc counts 1 whitespace token)
    return len(re.split(r"\s+", t.strip()))


def _bpe_words(t: str) -> list[str]:
    return [w for w in re.split(r"\s+", t.strip()) if w]


def test_tokenized_pack_stats_planted_corpus(spark, tmp_path):
    """Whitespace-budget vs learned-BPE-budget packing on a corpus
    planted so the two budgets DIFFER: every field of the one-row
    census must equal the Python reference computed from _ref_bpe."""
    from atlassian_confluence_data_pipeline_spark.plans.curation2 import (
        BPE_MERGES,
        tokenized_pack_stats,
    )
    from atlassian_confluence_data_pipeline_spark.plans.packing import (
        CTX_TOKENS,
    )
    from atlassian_confluence_data_pipeline_spark.plans.pretrain import (
        PAD_BUCKETS,
    )

    # heavy-merge words (aaaa, bb) exhaust the merge budget; the long
    # unmergeable-ish word keeps a big symbol count, so BPE token
    # counts diverge from whitespace counts per doc
    long_w = "zqxv" * 12
    texts = [
        "aaaa aaaa bb " * 30,
        f"{long_w} aaaa bb bb cc",
        "",
        "cc cc aaaa aaaa aaaa " * 20,
        f"{long_w} {long_w}",
    ]
    sf = _mk_docs(spark, tmp_path, texts)
    row = tokenized_pack_stats(spark, sf).collect()[0]

    freqs = Counter(w for t in texts for w in _bpe_words(t))
    _merges, seqs = _ref_bpe(dict(freqs), BPE_MERGES)
    tok_ws = [_ws_count(t) for t in texts]
    tok_bpe = [sum(len(seqs[w]) for w in _bpe_words(t)) for t in texts]
    assert tok_bpe != tok_ws  # the planted divergence

    def chopped(toks: list[int]) -> int:
        cum, n = 0, 0
        for t in toks:
            cum += t
            if t and (cum - 1) // CTX_TOKENS > (cum - t) // CTX_TOKENS:
                n += 1
        return n

    def padded(toks: list[int]) -> int:
        out = 0
        for t in toks:
            b = next((e for e in PAD_BUCKETS if t <= e), PAD_BUCKETS[-1] * 2)
            out += b - min(t, b)
        return out

    assert row.n_docs == len(texts)
    assert row.ws_tokens == sum(tok_ws)
    assert row.bpe_tokens == sum(tok_bpe)
    assert row.fertility == round(sum(tok_bpe) / sum(tok_ws), 6)
    assert row.n_windows_ws == -(-sum(tok_ws) // CTX_TOKENS)
    assert row.n_windows_bpe == -(-sum(tok_bpe) // CTX_TOKENS)
    assert row.n_chopped_ws == chopped(tok_ws)
    assert row.n_chopped_bpe == chopped(tok_bpe)
    assert row.padded_tokens_ws == padded(tok_ws)
    assert row.padded_tokens_bpe == padded(tok_bpe)
    # the budgets genuinely disagree on this corpus
    assert row.padded_tokens_bpe != row.padded_tokens_ws
    assert row.bpe_tokens > row.ws_tokens


def test_modality_component_agreement_vs_union_find(spark):
    """The cluster-level agreement census must equal a driver-side
    union-find over the SAME image/audio pair lists."""
    from atlassian_confluence_data_pipeline_spark.plans.multimodal4 import (
        _perceptual_pair_frames,
        modality_component_agreement,
    )

    img_pairs, aud_pairs, _vid = _perceptual_pair_frames(spark, SF)

    def components(pairs) -> dict[int, int]:
        parent: dict[int, int] = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in pairs.collect():
            a, b = find(r.id_a), find(r.id_b)
            if a != b:
                parent[max(a, b)] = min(a, b)
        # min-id representative per member
        return {x: find(x) for x in list(parent)}

    ic = components(img_pairs)
    ac = components(aud_pairs)
    docs = set(ic) | set(ac)
    img_r = {d: ic.get(d, -d - 1) for d in docs}
    aud_r = {d: ac.get(d, -d - 1) for d in docs}

    def side(c: dict[int, int], other: dict[int, int]):
        groups: dict[int, set[int]] = {}
        for d, rep in c.items():
            groups.setdefault(rep, set()).add(d)
        intact = sum(
            1
            for mem in groups.values()
            if len({other[d] for d in mem}) == 1
        )
        return len(groups), intact, groups

    ni, ii, ig = side(ic, aud_r)
    na, ia, ag = side(ac, img_r)
    # identical = image groups whose members' audio reps form one group
    # equal as a SET
    ident = 0
    for mem in ig.values():
        reps = {ac[d] for d in mem if d in ac}
        if len(reps) == 1 and ag.get(next(iter(reps))) == mem:
            ident += 1

    r = modality_component_agreement(spark, SF).collect()[0]
    assert r.n_image_components == ni
    assert r.n_image_intact == ii
    assert r.n_image_split == ni - ii
    assert r.n_audio_components == na
    assert r.n_audio_intact == ia
    assert r.n_audio_split == na - ia
    assert r.n_docs_image == len(ic)
    assert r.n_docs_audio == len(ac)
    assert r.n_docs_both == len(set(ic) & set(ac))
    assert r.n_identical_components == ident
    assert r.n_identical_components <= min(r.n_image_intact, r.n_audio_intact)


def test_bpe_fertility_by_source_planted(spark, tmp_path):
    """Per-source learned-vocab fertility equals the _ref_bpe
    reference on a planted corpus."""
    from atlassian_confluence_data_pipeline_spark.plans.curation2 import (
        BPE_MERGES,
        bpe_fertility_by_source,
    )

    texts = [
        "aaaa aaaa aaaa bb",       # src0
        "zqxw vkjh aaaa",          # src1
        "aaaa bb bb",              # src2
        "zqxw zqxw bb aaaa aaaa",  # src0
    ]
    sf = _mk_docs(spark, tmp_path, texts)
    freqs = Counter(w for t in texts for w in _bpe_words(t))
    _m, seqs = _ref_bpe(dict(freqs), BPE_MERGES)
    rows = {r.source: r for r in bpe_fertility_by_source(spark, sf).collect()}
    by_src: dict[str, list[str]] = {}
    for i, t in enumerate(texts):
        by_src.setdefault(f"src{i % 3}", []).append(t)
    for src, ts in by_src.items():
        r = rows[src]
        ws = sum(_ws_count(t) for t in ts)
        bpe = sum(len(seqs[w]) for t in ts for w in _bpe_words(t))
        chars = sum(len(t) for t in ts)
        assert r.n_docs == len(ts)
        assert r.ws_tokens == ws
        assert r.bpe_tokens == bpe
        assert r.fertility == round(bpe / ws, 6)
        assert r.chars_per_token == round(chars / bpe, 4)


def test_pq_adc_recall_consistent_with_audit(spark):
    """The recall rollup equals the per-query sum of the audit's
    exact_hit flags over the SAMPLED queries only."""
    from atlassian_confluence_data_pipeline_spark.plans.quantization import (
        ADC_TOPK,
        pq_adc_recall,
        pq_adc_topk,
    )

    audit = [
        r for r in pq_adc_topk(spark, SF).collect() if r.exact_hit is not None
    ]
    want: dict[int, int] = {}
    for r in audit:
        want[r.query_id] = want.get(r.query_id, 0) + r.exact_hit
    got = {r.query_id: r for r in pq_adc_recall(spark, SF).collect()}
    assert set(got) == set(want) and len(got) > 0
    for q, hits in want.items():
        assert got[q].n_hits == hits
        assert got[q].recall_at_k == round(hits / ADC_TOPK, 6)


def test_bpe_train_memoizes_per_session_and_fixture(spark, tmp_path, monkeypatch):
    """Round-11 optimization: the BPE fit is a deterministic function
    of the fixtures, so the four consumer queries must share ONE
    training run per (session, sf_dir) — and distinct fixture dirs
    must still train independently."""
    from atlassian_confluence_data_pipeline_spark.plans import curation2

    calls = []
    real = curation2.load_table

    def counting(spark_, sf_dir_, name):
        if name == "documents":
            calls.append(sf_dir_)
        return real(spark_, sf_dir_, name)

    monkeypatch.setattr(curation2, "load_table", counting)
    # long varied words: plenty of distinct adjacent pairs, so the
    # BPE_MERGES-round argmax never runs dry on either corpus
    sf_a = _mk_docs(
        spark, tmp_path, ["qwertyuiop qwertyuiop asdfghjkl", "asdfghjkl zxcvbnm"]
    )
    (tmp_path / "b").mkdir()
    sf_b = _mk_docs(
        spark, tmp_path / "b", ["mnbvcxzlkj mnbvcxzlkj poiuytrewq", "poiuytrewq"]
    )

    cur1, merges1 = curation2._bpe_train(spark, sf_a)
    trains_after_first = calls.count(sf_a)
    cur2, merges2 = curation2._bpe_train(spark, sf_a)
    assert merges2 == merges1
    assert cur2 is cur1  # memo hit: the checkpointed frame is shared
    assert calls.count(sf_a) == trains_after_first  # no re-train

    _cur3, merges3 = curation2._bpe_train(spark, sf_b)
    assert calls.count(sf_b) == trains_after_first  # b trained once too
    assert merges3 != merges1  # trained on ITS fixtures, not the memo
