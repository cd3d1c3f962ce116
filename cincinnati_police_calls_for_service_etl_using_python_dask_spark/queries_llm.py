"""LLM-data-pipeline query/oracle pairs (BASELINE.json north star):
dedup, similarity search, text analysis, multimodal plumbing.

Filled in milestone M5 (SURVEY.md §7.2).
"""

from __future__ import annotations
