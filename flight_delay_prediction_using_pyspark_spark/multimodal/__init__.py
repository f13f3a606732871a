"""Multimodal (image/audio/video) column support.

Media are opaque `binary` payload columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas UDFs over `mapInPandas`. See media.py.
"""
