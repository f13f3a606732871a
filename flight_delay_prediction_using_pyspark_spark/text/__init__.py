"""Text analysis + deduplication operators for LLM-data pipelines.

These extend the reference's capabilities (SURVEY.md §7 step 10) with
the document-processing operators a 100 TB training-data pipeline
needs: tokenization, quality scoring, language ID, fingerprinting
(analysis.py) and exact / MinHash-LSH / SimHash / n-gram-Jaccard /
embedding-cosine deduplication (dedup.py).

Everything is built from JVM-side higher-order array functions
(`transform`/`filter`/`aggregate`) — no Python UDFs in any hot path —
so plans stay inside whole-stage codegen and scale linearly with
executors.
"""
