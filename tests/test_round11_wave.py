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
