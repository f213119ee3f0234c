"""Large-scale training-data-pipeline functions: text analysis,
deduplication, similarity search, multimodal columns (BASELINE.json
north-star extensions beyond reference parity)."""
