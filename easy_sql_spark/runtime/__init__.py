"""Spark runtime for the step language: backend table management and the
step processor."""

from .backend import Partition, SparkBackend, TableMeta
from .processor import SqlProcessor

__all__ = ["SparkBackend", "SqlProcessor", "TableMeta", "Partition"]
