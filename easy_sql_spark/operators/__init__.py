"""Custom operators Spark lacks as single primitives, built as compositions
of DataFrame ops (SURVEY.md §7.2 M6 / the custom-operator ladder: DataFrame
composition first, Pandas UDF second, mapPartitions last)."""
