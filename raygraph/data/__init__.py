"""Training-data pipeline operators over generic Datasets.

Beyond the reference's graph surface: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard), text analysis (token counts, quality scores,
language id, fingerprints), similarity search (brute-force + IVF cosine
top-k), windowed aggregates over event streams, and multimodal plumbing.
All stages are map_batches / groupby pipelines designed to stream.
"""
