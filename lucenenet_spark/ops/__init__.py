"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal plumbing — the large-scale data-curation surface
layered on the same engine primitives (tokenizer, hashing, posting
tables)."""
