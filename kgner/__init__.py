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

__version__ = "0.1.0"

from kgner.session import get_spark  # noqa: E402,F401
from kgner.pipeline import Pipeline, PipelineConfig  # noqa: E402,F401
