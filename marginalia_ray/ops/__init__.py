"""Large-scale training-data operators over text / embedding tables.

These are first-class components beyond the Marginalia operator inventory
(SURVEY.md §2): deduplication (exact, MinHash+LSH, SimHash, n-gram
Jaccard), similarity search, and text analysis — each expressed as
Ray Data transforms designed for 100 TB inputs (vectorized Arrow batch
kernels, partial aggregation before shuffles, broadcast small sides).
"""
