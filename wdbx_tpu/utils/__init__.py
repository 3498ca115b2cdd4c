"""Cross-cutting utilities (reference wdbx/utils/): logging, security,
data ingestion, config file loading, visualization."""
