"""Training-data pipeline operators (deduplication, similarity search, text
analysis, windowed aggregates, multimodal plumbing) — the large-scale
data-processing surface the reference lacks, built as first-class Ray Data
stages over the ``documents`` / ``embeddings`` / ``events`` tables."""
