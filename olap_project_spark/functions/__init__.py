"""Column-level function library (text analysis, portable hashing,
vector math, multimodal plumbing) — all JVM-native expressions or
Arrow-batched Pandas UDFs; no row-at-a-time Python."""
