"""PySpark-native analytics engine with the query & data-processing
capabilities of coolpx/roblox-vector-search-datagen.

The reference (at /root/reference, TypeScript/Node) is a single-process
corpus pipeline + query API. This package re-expresses every operator in
its inventory (SURVEY.md §2) as idiomatic Spark DataFrame / Catalyst
plans designed for multi-executor scale: declarative logical plans,
broadcast joins for small dimensions, window-function dedup, Arrow-
vectorized pandas UDFs only where built-ins cannot express the
semantics, and explicit-schema Parquet IO.
"""

__version__ = "0.1.0"
