"""Scalar/vectorised function surface: text stats, langid, perplexity, scrub,
dedup, similarity, image plumbing."""
