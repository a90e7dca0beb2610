"""Query plans: the engine's declarative query corpus.

Importing this package populates the registry (``plans.registry.QUERIES``)
with every implemented operator's demonstration query plus its DuckDB
oracle SQL — the contract consumed by ``__spark_entry__.py``.
"""

from atlassian_confluence_data_pipeline_spark.plans import (  # noqa: F401
    alignment,
    analytics,
    analytics2,
    analytics3,
    analytics4,
    attribution,
    behavior,
    clustering,
    compliance,
    connector,
    curation,
    curation2,
    curation3,
    curation4,
    curation5,
    diagnostics,
    economics,
    embeddings2,
    evals,
    eventops,
    features,
    governance,
    graphops,
    hierarchy,
    hypothesis,
    layout,
    ledger,
    lookups,
    monitoring,
    multimodal,
    paths,
    patterns,
    pretrain,
    quality,
    quantization,
    relational,
    resampling,
    reshape,
    retail,
    scalar,
    search,
    similarity,
    simjoin,
    sketchq,
    surface2,
    systems,
    textops,
    timeseries,
    tpch_like,
    tpch2,
    tpch3,
    warehouse,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import QUERIES, QuerySpec

__all__ = ["QUERIES", "QuerySpec"]
