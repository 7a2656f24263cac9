"""fastlink_spark — a from-scratch PySpark-native Fellegi-Sunter
probabilistic record-linkage / entity-resolution engine.

Re-expresses the query and data-processing capabilities of the reference
(OPTI-SURVEIL/fastLink, an R + Rcpp package; see SURVEY.md) in idiomatic
PySpark: DataFrame programs + vectorized pandas/Arrow UDFs, a driver-side
NumPy EM over aggregated gamma-pattern counts (reference:
``R/emlinkMARmov.R``), blocking as key columns instead of index lists
(reference: ``R/blockData.R``), and iterative large-star/small-star
connected components for entity clustering (absent in the reference;
required by BASELINE.json north_star).

No code is copied from the reference; all reference citations are
file/function names in the public upstream fastLink source tree.
"""

__version__ = "0.1.0"
