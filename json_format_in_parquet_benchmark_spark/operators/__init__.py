"""First-class large-scale pipeline operators (dedup, similarity search,
as-of joins, multimodal column plumbing).  Each operator is a pure
DataFrame -> DataFrame transformation built from JVM-side primitives and
designed around a blocking/candidate-generation strategy that bounds the
shuffle volume at 100 TB."""
