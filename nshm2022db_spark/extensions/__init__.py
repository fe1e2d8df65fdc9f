"""LLM-training-data pipeline extensions (SURVEY §7 Phase 5 / north star).

These are first-class operators beyond the reference's own surface: dedup
(exact / minhash-LSH / simhash / n-gram Jaccard / embedding-cosine),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(lang-id, quality, tokens, fingerprints), multimodal column plumbing,
and streaming (in streaming/).
"""
