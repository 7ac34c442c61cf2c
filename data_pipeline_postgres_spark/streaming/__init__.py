"""Structured Streaming surface (SURVEY.md §2.9): the reference's
orchestration-level streaming semantics (daily tumbling batches,
latest-per-key CDC) made first-class."""
