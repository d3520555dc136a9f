"""Single-node oracle: plain-Python reimplementation of the full pipeline.

Mirrors the cited reference algorithms (see kgner.textops / kgner.spanops /
kgner.linkops docstrings) and is used by tests as the ground truth the Spark
DAG must match (triple P/R >= 0.95 per BASELINE.md; byte-identical extracted
text per url per the north rule).
"""

from kgner.oracle.pipeline import oracle_triples, oracle_ensemble  # noqa: F401
