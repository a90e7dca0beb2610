"""PySpark-native incremental document-ETL & analytics engine.

A brand-new engine (DataFrame / Catalyst / Structured Streaming) with the
query and data-processing capabilities of the reference pipeline
``ishaanbajpai/Atlassian-Confluence-Data-Pipeline`` (studied read-only;
see SURVEY.md), extended with LLM-data-pipeline operators (dedup,
similarity search, text analytics, multimodal columns) and designed for
100 TB scale: declarative plans, pushed-down predicates, broadcast-aware
joins, no driver-side collects in operator paths.
"""

from atlassian_confluence_data_pipeline_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
