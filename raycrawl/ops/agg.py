"""Two-level aggregation helper: distributed map-side combine + final merge.

``aggregate_partials`` runs ``partial_fn`` (a per-batch pandas groupby that
emits one row per key per batch) as a distributed ``map_batches`` stage, then
merges the partials. Merge strategy:

- ``reduce='driver'`` (default): stream the partial batches to the driver
  and combine with one pandas groupby. Correct choice whenever
  |keys| × |blocks| is small (all partials together are a few MB) — a Ray
  all-to-all shuffle costs tens of seconds of fixed overhead that dwarfs
  the work at that size (measured: 40-50 s for a 15 k-row sort-shuffle
  aggregate vs 0.3 s of real work on this Ray version).
- ``reduce='shuffle'``: ``repartition(n)`` + ``groupby().aggregate()`` for
  high-cardinality keys (10^8+ at cluster scale), where driver-side merge
  would not fit. Partials are already one-row-per-key-per-block, so the
  shuffle moves the minimum possible payload.

All aggregates used through this helper are exact integer sums/counts (see
relational.py's cents discipline), so merge order never changes results.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd


def aggregate_partials(
    ds,
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    keys: list[str],
    agg_spec: dict[str, str],
    reduce: str = "driver",
    batch_size: int = 65536,
    shuffle_partitions: int = 32,
) -> pd.DataFrame:
    partials = ds.map_batches(partial_fn, batch_format="pandas",
                              batch_size=batch_size)
    if reduce == "shuffle":
        from ray.data.aggregate import Max, Min, Sum

        ctor = {"sum": Sum, "min": Min, "max": Max}
        aggs = [ctor[how](col, alias_name=col) for col, how in agg_spec.items()]
        return (partials.repartition(shuffle_partitions)
                .groupby(keys[0] if len(keys) == 1 else keys)
                .aggregate(*aggs).to_pandas())
    frames = [b for b in partials.iter_batches(batch_size=batch_size,
                                               batch_format="pandas")]
    if not frames:
        return pd.DataFrame(columns=keys + list(agg_spec))
    allp = pd.concat(frames, ignore_index=True)
    return allp.groupby(keys, as_index=False).agg(
        **{col: (col, how) for col, how in agg_spec.items()})
