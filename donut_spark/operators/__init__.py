"""Pipelines: extraction (flagship), dedup, similarity search,
multimodal plumbing, resumable checkpointed runs."""
