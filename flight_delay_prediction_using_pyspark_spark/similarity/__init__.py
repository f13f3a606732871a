"""Similarity search over embedding columns (`array<float>`).

Brute-force cosine top-k as the exact baseline, random-hyperplane LSH
bucketing as the scale path, and a windowed k-NN join. See ann.py.
"""
