"""Generic operator library.

- ``dedup``      : exact / minhash-LSH / simhash / n-gram-jaccard /
                   embedding-cosine deduplication
- ``similarity`` : brute-force + LSH-bucketed cosine top-k search
- ``textops``    : language-ID, quality scoring, token counting,
                   fingerprinting
- ``multimodal`` : opaque-binary column plumbing (decode stubs)
"""
