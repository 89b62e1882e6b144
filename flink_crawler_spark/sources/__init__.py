"""Sources: seed ingestion, synthetic web-graph fixtures, streaming sources."""
