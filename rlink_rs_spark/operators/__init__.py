"""Operator library: the reference's 9 physical operator kinds re-expressed
as DataFrame transforms (SURVEY.md §2), plus the 100 TB-scale extras
(dedup, similarity search, text analysis, multimodal plumbing)."""
