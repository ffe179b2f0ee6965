"""PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference stack
``elkhdarABDELHAMID/Recommandation-de-Films-Jay-Z-Entertainment-Int-gration-de-Big-Data-et-IA``
(PySpark ETL + Elasticsearch query DSL + MLlib ALS + Flask serving).

Design stance (SURVEY.md §7.0): one engine, one IR. Every capability —
including the reference's Elasticsearch search semantics — is a DataFrame
transformation compiled by Catalyst. No row-at-a-time Python UDFs in the
hot path; built-in ``pyspark.sql.functions`` column math everywhere, with
Arrow-batched ``mapInPandas`` only for genuinely non-relational operators
(multimodal decode plumbing).

Modules
-------
``sources``    schema-declared readers/writers (csv, parquet, movielens)
``operators``  relational core, search, dedup, similarity, recommend
``functions``  column-expression libraries (text, hashing, scoring)
``plans``      the named query catalog + DuckDB oracle SQL
``streaming``  structured-streaming window/sessionize/stateful operators
"""

__version__ = "0.1.0"
