"""Pure-Python per-document kernels.

Every function here operates on one document's plain-Python data
(strings, lists of spans).  The distributed stages in
``renard_ray.stages`` call these inside ``map_batches`` (one call per
row) and the golden oracle in ``renard_ray.oracle`` calls the exact
same functions single-process — so per-document semantics of the
distributed run match the oracle by construction.
"""
