"""Engine operators that compose DataFrame primitives into higher-level
operations Spark lacks natively (as-of join, sessionization, grouped
top-k, dedup family, similarity search, multimodal plumbing)."""
