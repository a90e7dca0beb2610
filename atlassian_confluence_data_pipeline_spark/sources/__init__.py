"""Sources: fixture catalog bindings plus binary/multimodal ingestion
(SURVEY.md §2.1 scans; X5 multimodal columns)."""
