"""Large-scale training-data operators built on the same Ray-Data idioms as
the CDC engine: vectorized Arrow/numpy batch kernels, actor pools for
stateful stages, broadcast small sides, and a single explicit shuffle key
per pipeline. These extend the reference's operator set with the
operations a 100 TB training-data pipeline needs (dedup, similarity
search, text analysis, multimodal plumbing)."""
