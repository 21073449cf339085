"""Training-data-pipeline extensions (SURVEY.md §2.11, E1–E10).

Beyond the reference's operator inventory: the operations a large-scale
LLM training-data pipeline needs — deduplication (exact, Jaccard,
MinHash+LSH, SimHash, embedding-cosine) plus connected-components
cluster assignment (graph.py), similarity search (brute-force and
clustered ANN, k-means quantizer in clustering.py), text analysis
(language ID, quality scoring, token counting, fingerprinting, TF-IDF,
repetition metrics, PII redaction), cardinality sketches (sketches.py),
corpus construction (splits / sampling / packing / contamination,
corpus.py), event-time windows, and multimodal binary column plumbing.
"""
