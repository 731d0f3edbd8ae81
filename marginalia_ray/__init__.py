"""marginalia_ray: Ray-Data-native full-text index + BM25 retrieval engine.

Shuffle strategy note: wide operators in this engine pass explicit
``num_partitions`` to ``groupby`` (Ray Data's per-op hash-shuffle path,
~2x faster than the default sort shuffle for our dense integer keys); the
global strategy default is left untouched.
"""
