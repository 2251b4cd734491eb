"""typhoon_ocr_spark — a from-scratch, PySpark-native document-to-text
extraction engine with the query/data-processing capabilities of
naravid19/typhoon-ocr (reference, read-only, at /root/reference).

Layout
------
- ``oracle/``     pure-Python, dependency-free reference-faithful functions.
                  These define the byte-identical correctness surface; both
                  the pytest goldens and the Spark UDFs call them.
- ``functions/``  pandas/Arrow UDF wrappers + native column expressions.
- ``operators/``  staged DataFrame transforms (sniff → parse → linearize →
                  assemble; dedup; similarity; text analysis).
- ``sources/``    pages-table fixture generation and Iceberg-style
                  (partitioned parquet + manifest) readers/writers.
- ``plans/``      SparkSession builders, job configs, pipeline assembly.
- ``streaming/``  checkpoint-resumable batch runner + metrics.

Everything here derives from public knowledge only: the PySpark API and
the reference repo's observable behavior (cited by file:line in
docstrings).
"""

__version__ = "0.1.0"
