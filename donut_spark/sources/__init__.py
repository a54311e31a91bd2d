"""Table catalog, session helpers, and deterministic fixture synthesis."""
