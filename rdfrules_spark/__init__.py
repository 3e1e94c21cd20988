"""rdfrules_spark — a from-scratch PySpark-native KG-construction + rule-mining engine.

Re-expresses the capabilities of propi/rdfrules (reference at /root/reference,
see SURVEY.md) as an idiomatic Spark DataFrame program:

  documents (interleaved text+media spans)
    -> vectorized mention detection / relation extraction      (extraction.py)
    -> entity-link scoring (broadcast alias dict + window)     (linking.py)
    -> sameAs canonicalization via salted connected components (canonicalize.py)
    -> dictionary-encoded, predicate-bucketed triple store     (dictionary.py)
    -> per-predicate statistics                                (dictionary.py)
    -> AMIE+-style top-k rule mining (self-join BFS stages)    (mining/)

Plus the reference's pre-processing operator inventory (SURVEY.md §2) over
generic tables: histograms, property stats, filters/maps, discretization,
sampling/split, dedup (exact/minhash/simhash), text analysis, similarity
search — in rdfrules_spark/operators/.
"""

__version__ = "0.1.0"

from rdfrules_spark.session import get_spark  # noqa: F401
