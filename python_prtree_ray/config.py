"""Engine-wide Ray Data context tuning.

Measured on this workload (1.7M-row expanded union → groupby(cell) →
per-cell join, 12.5M output pairs, single node):

    default pull-based sort shuffle:  7-19 s @ 32 CPUs (degrades with
                                      block count: O(B²) tiny objects)
    push-based sort shuffle:          2.5-3.8 s @ 32 CPUs, 2.6 s @ 8
    hash shuffle:                     23-55 s (per-key actor overhead)

Push-based shuffle merges map outputs before reduce — exactly what the
many-cells groupby needs, and the strategy that keeps scaling on a real
multi-node cluster where the shuffle matrix crosses machines.
"""

from __future__ import annotations

# Map-side combiner bundle size (rows). Every pre-shuffle combiner
# map_batches passes this so Ray BUNDLES small upstream blocks into one
# batch: partials combine over ~64k rows instead of whatever tiny block
# the reader produced, and the shuffle sees one block per bundle instead
# of one per reader task. Measured on the Q3 revenue chain at sf0.1/32
# CPUs: 2.5-8 s (64 x 9.4k-row blocks into the sort) → stable 1.7 s.
# 64k rows of combiner partials is single-digit MB — safe at any scale,
# and at 100 TB the bundling is a no-op (blocks are already larger).
COMBINE_BATCH = 65536

_TUNED = False


def tune_context() -> None:
    """Idempotently apply engine defaults to the ambient DataContext.
    Safe to call from every pipeline constructor."""
    global _TUNED
    if _TUNED:
        return
    try:
        from ray.data.context import DataContext, ShuffleStrategy

        ctx = DataContext.get_current()
        ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    except Exception:  # older/newer Ray: keep defaults
        pass
    _TUNED = True
