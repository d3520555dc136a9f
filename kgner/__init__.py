"""kgner — a PySpark-native knowledge-graph construction engine.

Re-expresses the capabilities of Alibaba-NLP/KB-NER (retrieval-augmented NER
-> entity linking -> canonicalization -> triple materialization) as idiomatic
Spark DataFrame pipelines with vectorized Arrow UDFs. See SURVEY.md for the
structural analysis of the reference and COVERAGE.md for the
operator-by-operator map.

Quick start:

    from kgner import get_spark, Pipeline, PipelineConfig
    spark = get_spark()
    pipe = Pipeline(spark, PipelineConfig(workdir="/tmp/kg"), pages, kb, redirects)
    triples = pipe.run()
"""

__version__ = "0.2.0"

# Lazy re-exports: importing a pure submodule (kgner.textops, kgner.bm25)
# must NOT pull in pyspark — the pure core stays importable anywhere.
_LAZY = {
    "get_spark": ("kgner.session", "get_spark"),
    "Pipeline": ("kgner.pipeline", "Pipeline"),
    "PipelineConfig": ("kgner.pipeline", "PipelineConfig"),
}


def __getattr__(name: str):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'kgner' has no attribute {name!r}")


__all__ = sorted(_LAZY)  # keeps `from kgner import *` working (PEP 562
# __getattr__ is not consulted by star-import without __all__)


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
