"""Pure per-document kernels (no Ray imports).

Each module re-implements, from behavior, one slice of the reference
extractor's semantics (citations into /root/reference in the docstrings).
These functions are called from inside ``map_batches`` UDFs; they must be
deterministic (no wall clock, no randomness) so golden outputs are stable.
"""
