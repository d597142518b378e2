"""Shared column-expression builders.

Everything here returns Spark ``Column``s built from JVM-side built-ins (no
Python row UDFs in any hot path) and, where a query needs a DuckDB oracle,
the matching SQL fragment.  The portable-hash module is the keystone: both
engines compute md5 identically, so every randomized-looking operator
(MinHash, SimHash, LSH hyperplanes) is deterministic and cross-checkable.
"""
