"""soweego_spark — a PySpark-native entity-resolution / record-linkage engine.

A from-scratch rebuild of the capabilities of Wikidata/soweego (reference at
/root/reference, a single-node pandas+MariaDB pipeline) as an idiomatic Spark
engine over a lake of Common-Crawl-style web pages:

    pages(url, warc_ts, html, text, lang)
      -> extract signatures        (operators.extract)
      -> block candidate pairs     (operators.blocking; salted multi-key)
      -> assemble + featurize      (operators.pairs / operators.features)
      -> score w/ broadcast model  (operators.classify)
      -> post rules + threshold    (operators.classify)
      -> connected components      (operators.cluster; large-star/small-star)

Plus a training-data toolbox over document/embedding tables
(operators.dedup, operators.similarity_search, operators.textstats).

Everything is DataFrame-first: built-in pyspark.sql.functions where the
semantics allow, Arrow-batched pandas UDFs where they do not, zero
row-at-a-time Python in the hot path.
"""

__version__ = "0.1.0"
