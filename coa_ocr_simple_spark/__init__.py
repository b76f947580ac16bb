"""coa_ocr_simple_spark — a from-scratch, PySpark-native reimplementation of
the document-extraction capabilities of pbrose82/coa-ocr-simple.

Layout (SURVEY.md §7):
- ``core``      pure-Python frozen reference semantics (also the test oracle)
- ``functions`` pandas/Arrow UDF factories + Spark schemas
- ``operators`` span assembly, skew salting, checkpoint/resume, dedup, text ops
- ``sources``   table readers/writers (Iceberg when available, Parquet fallback)
- ``plans``     end-to-end DataFrame plan builders
- ``jobs``      spark-submit entry points
- ``fixtures``  seed-fixed synthetic spans/media generators (FIXTURES.md)
"""

__version__ = "0.1.0"
