"""Core step-language machinery (no Spark dependency).

Implements the annotated-SQL dialect of the reference
(easy_sql/sql_processor/): ``-- target=<type>.<name>[, if=func(args)]``
headers splitting a file into steps, ``${var}`` / ``@{template}`` text
macros, ``-- include=`` expansion, and the callable-function registry.
"""
