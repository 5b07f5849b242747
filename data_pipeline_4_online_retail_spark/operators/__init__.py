"""Operators.

- ``relational``      the SURVEY.md §2 relational inventory as micro-queries
                      (projection, filter, join family, window family,
                      aggregation family, set ops, top-k, JSON, rollup)
- ``dedup``           exact + fuzzy dedup (hash, MinHash+LSH, SimHash,
                      n-gram Jaccard, embedding-cosine)
- ``similarity``      vector similarity search (brute-force + LSH-bucketed)
- ``text_analysis``   language-ID, quality scoring, token counts,
                      fingerprinting
- ``multimodal``      binary-column plumbing (decode/feature UDF shells)
- ``events_windows``  batch analogues of the streaming window operators
"""
