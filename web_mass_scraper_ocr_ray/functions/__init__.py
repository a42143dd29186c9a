"""Pure, Ray-free scalar/row functions.

These are the reference-semantics kernels. They are deliberately free of
any Ray import so the exact same code path serves as the row-at-a-time
golden oracle in tests (FIXTURES.md §3) and as the vectorized body of
``map_batches`` stages.
"""
