"""Shared substrate for size-gated single-task numpy kernels.

Cost-model physical choice, the same rule as components.py
``LOCAL_CC_MAX_EDGES`` / triangles.py ``LOCAL_TRI_MAX_EDGES`` /
pagerank.py ``LOCAL_PR_MAX_EDGES``: below a few million edges the
per-superstep shuffle + scheduling floor (~0.5-1 s/superstep on
local[N]) dwarfs the O(m) vectorized gather (~1 ms per 10^6 edges),
so the whole iterative loop runs inside ONE Arrow task.  Above the
gate the distributed superstep plan — the 100 TB path — takes over;
``*_dist`` entry twins pin that plan in the driver's correctness gate
so both physical shapes stay hash-verified.

The substrate ships the (already direction- and weight-resolved) edge
rows plus one per-vertex statics row through a tagged union into a
single ``mapInPandas`` task, hands the kernel sorted member-id arrays
plus aligned statics and raw edge arrays, and returns the kernel's
output columns as a DataFrame.  Convergence metadata rides back as
constant extra columns so non-convergence can raise on the DRIVER,
exactly like the superstep loops.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_local_kernel(
    edges: DataFrame,
    statics: DataFrame,
    static_cols: list[str],
    kernel: Callable,
    out_schema: str,
) -> DataFrame:
    """Run ``kernel`` over the whole graph in one Arrow task.

    ``edges`` must have (src, dst, weight); ``statics`` one row per
    member vertex with (id, *static_cols), every static cast-able to
    double.  ``kernel(ids, stat, es, ed, ew)`` receives the SORTED
    member-id int64 array, a dict of statics aligned to it, and the
    raw edge arrays; it returns a dict of equal-length output arrays
    (must include ``id``) matching ``out_schema``.
    """
    sel_e = [
        F.lit(0).alias("tag"),
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.col("weight").cast("double").alias("weight"),
    ]
    sel_v = [
        F.lit(1).alias("tag"),
        F.col("id").cast("long").alias("src"),
        F.lit(0).cast("long").alias("dst"),
        F.lit(0.0).alias("weight"),
    ]
    for c in static_cols:
        sel_e.append(F.lit(0.0).alias(c))
        sel_v.append(F.col(c).cast("double").alias(c))
    inp = edges.select(*sel_e).unionByName(statics.select(*sel_v)).coalesce(1)

    def fn(batches):
        import numpy as np
        import pandas as pd

        dfs = list(batches)
        if not dfs:
            return
        df = pd.concat(dfs, ignore_index=True)
        v = df[df["tag"] == 1]
        e = df[df["tag"] == 0]
        ids_raw = v["src"].to_numpy(dtype="int64")
        order = np.argsort(ids_raw, kind="stable")
        ids = ids_raw[order]
        stat = {c: v[c].to_numpy(dtype="float64")[order] for c in static_cols}
        es = e["src"].to_numpy(dtype="int64")
        ed = e["dst"].to_numpy(dtype="int64")
        ew = e["weight"].to_numpy(dtype="float64")
        yield pd.DataFrame(kernel(ids, stat, es, ed, ew))

    return inp.mapInPandas(fn, out_schema)


def member_maps(ids, es, ed):
    """Index raw endpoint arrays into the sorted member-id array.

    Returns ``(si, di, member_s, member_d)``: for each edge, the
    position of src / dst in ``ids`` plus boolean membership masks
    (an endpoint absent from ``ids`` is a non-member; the distributed
    plans drop its flow at the vertex left-join, so kernels gather
    only over ``member_s & member_d`` edges).
    """
    import numpy as np

    nv = len(ids)
    cap = max(nv - 1, 0)
    si = np.searchsorted(ids, es)
    member_s = (si < nv) & (ids[np.minimum(si, cap)] == es) if nv else np.zeros(len(es), bool)
    di = np.searchsorted(ids, ed)
    member_d = (di < nv) & (ids[np.minimum(di, cap)] == ed) if nv else np.zeros(len(ed), bool)
    return si, di, member_s, member_d
