"""[EXT] LLM-data-pipeline operator queries (SURVEY.md §2.11).

Filled in incrementally: dedup family, similarity search, text
analysis, multimodal plumbing.
"""

from __future__ import annotations
