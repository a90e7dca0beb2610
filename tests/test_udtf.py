"""Python UDTF (§2.10): one page -> many rows, the generalization of the
reference's children.page.results flattening (confluence_client.py:
336-337) beyond what explode covers (per-row custom row generation)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_sentence_splitter_udtf(spark):
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, sentence_id int, sentence string")
    class SplitSentences:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            for i, s in enumerate(p.strip() for p in text.split(".")):
                if s:
                    yield doc_id, i, s

    spark.udtf.register("split_sentences", SplitSentences)
    df = spark.createDataFrame(
        [(1, "First one. Second one."), (2, None), (3, "Only.")],
        ["doc_id", "text"],
    )
    df.createOrReplaceTempView("__udtf_docs")
    out = spark.sql(
        """
        SELECT s.doc_id, s.sentence_id, s.sentence
        FROM __udtf_docs d,
        LATERAL split_sentences(d.doc_id, d.text) s
        """
    ).collect()
    got = {(r["doc_id"], r["sentence_id"]): r["sentence"] for r in out}
    assert got == {
        (1, 0): "First one",
        (1, 1): "Second one",
        (3, 0): "Only",
    }
