"""kgner — a PySpark-native knowledge-graph construction engine.

Re-expresses the capabilities of Alibaba-NLP/KB-NER (retrieval-augmented NER
-> entity linking -> canonicalization -> triple materialization) as idiomatic
Spark DataFrame pipelines with vectorized Arrow UDFs. See SURVEY.md for the
structural analysis of the reference and the operator-by-operator mapping.
"""

__version__ = "0.1.0"
