"""distributed_mapreduce_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of SpikerYang/Distributed-MapReduce (the MIT 6.824 Lab 1
distributed MapReduce plus the declared KV-store surface of Labs 2-4),
extended with large-scale LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) per SURVEY.md.

Design: DataFrame/SQL declarative plans optimized by Catalyst; RDDs
only for the faithful generic map/reduce UDF surface; Pandas UDFs /
applyInPandas for operators Spark lacks natively; Structured Streaming
for streams. See SURVEY.md for the reference-capability mapping.
"""

__version__ = "0.1.0"
