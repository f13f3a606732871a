"""Application layer: the CLI batch job mirroring the reference's
entry points (train, score, count-only, no-spark smoke). See cli.py.
"""
