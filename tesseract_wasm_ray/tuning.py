"""Ray Data context tuning for this engine's pipelines.

Measured on the extraction pipeline (16 CPUs, 20k-doc corpus):
``op_resource_reservation_enabled`` throttled the streaming executor to
~40% CPU utilization — the DAG has ~12 small operators and the
per-operator reservation slices leave most of the budget idle (23.4s ->
10.7s wall with it disabled).  Memory safety still holds: batches are
small (text spans, bounded-size page rasters) and every wide stage is
bucketed, so disabling the reservation does not risk unbounded buffering
here.  Call once per session before running pipelines; safe to call
multiple times.
"""

from __future__ import annotations


def apply_data_context_tuning() -> None:
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.op_resource_reservation_enabled = False
