"""Operator library: extraction, blocking, pair features, classification,
clustering, validation, dedup, similarity search, text stats."""
