"""Round-10 wave invariants: full BPE merge loop, plus the round's
other new operators (PQ-ADC top-k, DPO pairs, crypto roundtrip,
multimodal curation) as they land."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _mk_docs(spark, tmp_path, texts):
    sf = tmp_path / "sf"
    sf.mkdir()
    rows = [
        (i + 1, t, "en", f"src{i % 3}", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(sf / "documents.parquet"))
    return str(sf)


def _ref_bpe(word_freqs: dict, n_merges: int):
    """Tiny reference BPE (Sennrich): greedy left-to-right merge apply,
    max-weight pair with lexicographic tie-break."""
    seqs = {w: list(w) for w in word_freqs}
    merges = []
    for step in range(1, n_merges + 1):
        counts = {}
        for w, f in word_freqs.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        # max by weight, then LEXICOGRAPHICALLY SMALLEST pair
        w_max = max(counts.values())
        cand = sorted(k for k, v in counts.items() if v == w_max)
        s1, s2 = cand[0]
        merges.append((step, s1, s2, s1 + s2, w_max))
        for w in seqs:
            s = seqs[w]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == s1 and s[i + 1] == s2:
                    out.append(s1 + s2)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


def test_bpe_planted_corpus_matches_reference(spark, tmp_path):
    from atlassian_confluence_data_pipeline_spark.plans.curation2 import (
        bpe_merge_iterations,
    )

    texts = [
        "aaab aaab aab banana bandana",
        "banana band banana ananas",
        "low lower lowest low low",
    ]
    sf = _mk_docs(spark, tmp_path, texts)
    wf = {}
    for t in texts:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    expected, _ = _ref_bpe(wf, 8)
    got = [
        (r.step, r.left_sym, r.right_sym, r.merged, r.weight)
        for r in bpe_merge_iterations(spark, sf).orderBy("step").collect()
    ]
    assert got == expected


def test_bpe_weights_non_increasing_and_symbols_shrink(spark):
    """New-pair counts after a merge are bounded by the merged pair's
    count, so learned weights are non-increasing; each merge with
    weight w removes exactly w symbol occurrences from the corpus."""
    from atlassian_confluence_data_pipeline_spark.plans.curation2 import (
        BPE_MERGES,
        bpe_merge_iterations,
    )

    rows = bpe_merge_iterations(spark, SF).orderBy("step").collect()
    assert [r.step for r in rows] == list(range(1, BPE_MERGES + 1))
    weights = [r.weight for r in rows]
    assert all(w > 0 for w in weights)
    assert all(a >= b for a, b in zip(weights, weights[1:]))
    # merged tokens are distinct and concatenations of their parts
    assert len({r.merged for r in rows}) == len(rows)
    for r in rows:
        assert r.merged == r.left_sym + r.right_sym


def test_pq_adc_topk_structure_and_audit(spark):
    """ADC ranking: k rows per query, ranks 1..k, non-decreasing
    distances, exact_hit consistent with a brute-force reference on
    the same fixture."""
    from atlassian_confluence_data_pipeline_spark.plans.quantization import (
        ADC_QUERIES,
        ADC_TOPK,
        pq_adc_topk,
    )

    from atlassian_confluence_data_pipeline_spark.plans.quantization import (
        ADC_AUDIT_A,
        ADC_AUDIT_B,
        ADC_AUDIT_MOD,
        pq_adc_search,
    )

    def sampled(qid: int) -> bool:
        return (ADC_AUDIT_A * qid + ADC_AUDIT_B) % ADC_AUDIT_MOD % 2 == 0

    rows = pq_adc_topk(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == ADC_QUERIES
    # the hash sample hits some queries and spares others
    assert any(sampled(q) for q in by_q) and not all(sampled(q) for q in by_q)
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, ADC_TOPK + 1))
        dists = [r.adc_dist for r in rs]
        assert all(a <= b for a, b in zip(dists, dists[1:]))
        if sampled(q):
            assert all(r.exact_hit in (0, 1) for r in rs)
        else:
            assert all(r.exact_hit is None for r in rs)
        assert all(r.neighbor_id != q for r in rs)

    # the production search returns the SAME ADC ranking, no audit col
    srows = pq_adc_search(spark, SF).collect()
    assert {tuple(r)[:4] for r in rows} == {tuple(r) for r in srows}
    assert "exact_hit" not in srows[0].asDict()

    # exact_hit flags agree with a numpy brute-force exact top-k on
    # the SAMPLED queries
    import numpy as np

    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    emb = {
        r.vec_id: np.array(r.embedding, dtype="float64")
        for r in load_table(spark, SF, "embeddings").collect()
    }
    for q, rs in by_q.items():
        if not sampled(q):
            continue
        d = {
            nid: float(((emb[q] - v) ** 2).sum())
            for nid, v in emb.items()
            if nid != q
        }
        exact5 = {
            nid
            for nid, _ in sorted(d.items(), key=lambda kv: (kv[1], kv[0]))[
                :ADC_TOPK
            ]
        }
        for r in rs:
            assert r.exact_hit == int(r.neighbor_id in exact5)


def test_dpo_pairs_planted_preference(spark, tmp_path):
    """Planted preference: source 'a' docs are strictly longer, so
    every cross-source duel is won by 'a' — DPO pairs must all point
    a-over-b, clear the Wilson gate, carry a positive strength margin,
    and down-weight duplicated chosen content."""
    from atlassian_confluence_data_pipeline_spark.plans.preference import (
        DPO_WILSON_MIN,
        dpo_pair_construction,
    )

    dup_text = " ".join(f"dup{i:02d}" for i in range(40))
    short_u = "one two three four five six seven {}"
    rows = []
    for d in range(1, 41):
        if d % 2 == 1:  # source a, long; doc_ids 21..29 odd share text
            # unique docs use fully DISJOINT word sets (a shared prefix
            # would near-dup-cluster them and shrink their weights)
            t = dup_text if 20 < d < 30 else " ".join(
                f"doc{d:02d}w{i:02d}" for i in range(40)
            )
            rows.append((d, t, "en", "a", len(t)))
        else:
            t = short_u.format(f"v{d}")
            rows.append((d, t, "en", "b", len(t)))
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(sf / "documents.parquet"))

    out = dpo_pair_construction(spark, str(sf)).collect()
    assert out  # the planted preference survives the Wilson gate
    for r in out:
        assert r.chosen_source == "a" and r.rejected_source == "b"
        assert r.chosen_doc_id % 2 == 1 and r.rejected_doc_id % 2 == 0
        assert r.margin > 0
        assert r.wilson_lb > DPO_WILSON_MIN
    dup_ids = {d for d in range(21, 30, 2)}
    w_dup = {r.weight for r in out if r.chosen_doc_id in dup_ids}
    w_uniq = {r.weight for r in out if r.chosen_doc_id not in dup_ids}
    assert w_dup and all(w < 1.0 for w in w_dup)
    assert w_uniq and all(w == 1.0 for w in w_uniq)


def test_mm_curation_census_invariants(spark):
    """Cross-modal census: all four modalities present, arithmetic
    consistent, and the text row agrees with the text-only pipeline's
    census over the same fixture."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from atlassian_confluence_data_pipeline_spark.plans.curation import (
        full_curation_pipeline,
    )
    from atlassian_confluence_data_pipeline_spark.plans.multimodal4 import (
        full_curation_pipeline_mm,
    )

    rows = {r.modality: r for r in full_curation_pipeline_mm(spark, SF).collect()}
    assert set(rows) == {"text", "image", "audio", "video"}
    n_docs = load_table(spark, SF, "documents").count()
    for r in rows.values():
        assert r.n_items == n_docs  # every doc has every modality fixture
        assert r.n_survivors == r.n_items - r.n_dropped
        assert 0 <= r.n_dropped <= r.n_items
        if r.modality != "text":  # text drops include the quality gate
            assert r.n_dup_pairs >= r.n_dropped  # each drop needs a pair

    text_census = full_curation_pipeline(spark, SF).collect()
    assert rows["text"].n_survivors == sum(r.n_docs for r in text_census)


def test_bpe_token_census_consistency(spark, tmp_path):
    """The census over the trained symbol table must agree with the
    reference BPE's final sequences on a planted corpus, and merged
    tokens must appear with their expected corpus counts."""
    from atlassian_confluence_data_pipeline_spark.plans.curation2 import (
        bpe_token_census,
    )

    texts = [
        "aaab aaab aab banana bandana",
        "banana band banana ananas",
        "low lower lowest low low",
    ]
    sf = _mk_docs(spark, tmp_path, texts)
    wf = {}
    for t in texts:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    _, seqs = _ref_bpe(wf, 8)
    expected = {}
    for w, f in wf.items():
        for s in seqs[w]:
            expected[s] = expected.get(s, 0) + f
    top = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    got = [
        (r.symbol, r.n_occurrences)
        for r in bpe_token_census(spark, sf).orderBy("rnk").collect()
    ]
    assert got == top
