"""Scalar/vectorised function surface: text stats, langid, perplexity, scrub,
dedup, decontamination, similarity, relational (as-of / range joins,
connected components), stats (sampling, outlier screens), multimodal
image/audio/video plumbing."""
