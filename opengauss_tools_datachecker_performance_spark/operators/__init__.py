"""Operators (SURVEY.md §2): the diff core, dedup families,
similarity search, text analysis, multimodal plumbing."""
