"""Wavelet registry (lifting-scheme descriptions of each family)."""
