"""Spark DataFrame pipeline stages."""
