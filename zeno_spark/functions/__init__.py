"""Vectorized (Arrow/pandas-UDF) function library: URL canonicalization,
FNV-1a hashing, deterministic image codec, perceptual hashing."""
