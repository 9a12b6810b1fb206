"""PySpark-native star-schema ETL engine.

A from-scratch reimplementation of the query/data-processing capabilities of
``abdulrehman764/Glue-Jobs-for-Data-Pipeline`` (a Glue→Redshift SQL-string ETL)
on the open Spark DataFrame/SQL stack, plus large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Layout:
    session      -- tuned SparkSession builder
    schemas      -- StructType registry + table configs (dict-driven genericity)
    sources      -- readers/writers (CSV bulk load, parquet, testdata loaders)
    functions    -- scalar kernels (date parts, text stats, vector math)
    operators    -- relational + ETL operators (validation, SCD2, dates, fact,
                    dedup, similarity, multimodal)
    plans        -- the config-driven pipeline runner
    streaming    -- Structured Streaming surface over the events fixture
"""

__version__ = "0.1.0"
