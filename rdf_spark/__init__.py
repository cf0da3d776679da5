"""rdf_spark — a PySpark-native knowledge-graph construction engine.

Re-expresses the capabilities of the reference RDF library (knakk/rdf,
read-only at /root/reference) as a distributed Spark pipeline: streaming
text decoders become Arrow-batched per-document parsers inside
``mapInPandas``; encoders become column projections; dedup/materialize
become salted DataFrame aggregations over partitioned parquet/Iceberg
tables.  See SURVEY.md for the full blueprint.

Layering (bottom → top):

* ``chars`` / ``lexer`` / ``parsing`` / ``terms`` — pure Python, no Spark
  dependency; safe to import on executors inside UDFs.
* ``sources`` / ``encoders`` / ``canonical`` / ``ops`` — DataFrame-level
  operators (imports pyspark).
* ``pipeline`` — end-to-end KG construction (pages → triples store).
"""

__version__ = "0.1.0"
