"""Large-scale training-data operators: dedup, similarity search, text
analysis, multimodal plumbing.

Design rules shared by every module here:

* Built-in ``pyspark.sql.functions`` only in hot paths — array/lambda
  expressions keep the math row-local (zero shuffle) and inside
  whole-stage codegen; Python appears only in clearly-marked pandas-UDF
  stages (multimodal decode).
* All hashing is **md5-derived** (``hash60``): deterministic,
  engine-portable (the DuckDB oracle reproduces identical values), and
  independent of partitioning/parallelism — unlike ``xxhash64`` whose
  seeds/availability differ across engines.
"""
