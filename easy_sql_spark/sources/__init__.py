"""Custom Spark data sources (Python Data Source API, Spark 4).

- :mod:`.warc_source` — ``format("warc")``: WARC / CommonCrawl .warc.gz
  files as a DataFrame, one record per row.
(The streaming snapshot change feed lives in streaming/cdf_source.py.)
"""
