"""Large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) — first-class components alongside the
KG pipeline, all expressed as DataFrame transforms."""
