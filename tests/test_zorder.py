"""Z-order layout: measure that the clustered rewrite actually enables
data skipping (file-level min/max pruning), not just that it round-trips.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from mapreduce_server_spark import REGISTRY
from mapreduce_server_spark.operators.sources_ops import SCRATCH, sink_dir

from .conftest import SF001


def _file_bounds(path_glob: str) -> list[tuple[int, int, int, int]]:
    """(min_part, max_part, min_supp, max_supp) per parquet file."""
    bounds = []
    for f in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(f).metadata
        schema_names = [md.row_group(0).column(c).path_in_schema for c in range(md.num_columns)]
        pi, si = schema_names.index("l_partkey"), schema_names.index("l_suppkey")
        pmin = min(md.row_group(g).column(pi).statistics.min for g in range(md.num_row_groups))
        pmax = max(md.row_group(g).column(pi).statistics.max for g in range(md.num_row_groups))
        smin = min(md.row_group(g).column(si).statistics.min for g in range(md.num_row_groups))
        smax = max(md.row_group(g).column(si).statistics.max for g in range(md.num_row_groups))
        bounds.append((pmin, pmax, smin, smax))
    return bounds


def _overlaps(bounds, p_lo, p_hi, s_lo, s_hi) -> int:
    return sum(
        1
        for pmin, pmax, smin, smax in bounds
        if pmin <= p_hi and pmax >= p_lo and smin <= s_hi and smax >= s_lo
    )


def test_zorder_roundtrip_and_file_skipping(spark):
    """After the z-order rewrite, a box probe on (l_partkey, l_suppkey)
    must overlap strictly fewer files than in the natural layout, where
    every file spans the whole key domain (no skipping possible)."""
    # build the clustered copy (also verified value-exact by the oracle gate)
    REGISTRY["sink_zorder"].fn(spark, SF001).collect()
    zfiles = _file_bounds(os.path.join(sink_dir("sink_zorder", SF001), "*.parquet"))
    assert len(zfiles) == 8

    # natural layout: one unsorted rewrite with the same file count
    li = spark.read.parquet(f"{SF001}/lineitem.parquet")
    nat = os.path.join(SCRATCH, "zorder_natural_sf0.01")
    li.repartition(8).write.mode("overwrite").parquet(nat)
    nfiles = _file_bounds(os.path.join(nat, "*.parquet"))

    # box probes across the key domain (sf0.01: partkey ≤ 2000, suppkey ≤ 100)
    probes = [(1, 250, 1, 12), (500, 750, 25, 37), (1200, 1450, 60, 72), (1700, 1950, 85, 97)]
    z_hits = sum(_overlaps(zfiles, *p) for p in probes)
    n_hits = sum(_overlaps(nfiles, *p) for p in probes)
    assert n_hits == 8 * len(probes), "natural layout files span the domain"
    assert z_hits < n_hits / 2, (z_hits, n_hits)  # ≥2× fewer files touched
