"""Training-data-pipeline extensions (SURVEY.md §2.11, E1–E6).

Beyond the reference's operator inventory: the operations a large-scale
LLM training-data pipeline needs — deduplication (exact, Jaccard,
MinHash+LSH, SimHash, embedding-cosine), similarity search (brute-force
and clustered ANN), text analysis (language ID, quality scoring, token
counting, fingerprinting), event-time windows, and multimodal binary
column plumbing.
"""
