"""External source connectors (ingest edges into the pages universe)."""
