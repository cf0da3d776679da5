"""Large-scale data-pipeline operators beyond the reference's surface:
dedup families, similarity search, text analysis, multimodal plumbing,
skew-handling helpers."""
