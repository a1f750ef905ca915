"""Pure-numpy geometry layer: WKB codec + vectorized kernels.

No shapely/GEOS — every kernel is written against numpy arrays so it can
run Arrow-batched inside pandas UDFs (BASELINE.json input_hint: "no
per-row Python").
"""

from . import kernels, wkb  # noqa: F401
