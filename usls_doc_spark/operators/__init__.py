"""Large-scale training-data-pipeline operators: text analysis, dedup,
similarity search, plus the relational query suite.

Queries here are defined once and rendered into both Spark SQL and DuckDB
SQL (operators/dialect.py), so the driver's oracle comparison checks the
exact same semantics the Spark plan executes.
"""
