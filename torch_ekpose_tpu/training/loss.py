"""The 6-stage CPM loss (reference train.py:300-339 ``get_loss``):

    total = sum over stages s, branches b of MSE_sum(pred, target) / batch

The heatmap target includes the background channel; the per-stage sums and
the max/min of the final maps are returned for the same 16 metric series
the reference logs (loss_stage{s}_L{1,2}, max/min_ht, max/min_paf).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp

__all__ = ["cpm_loss", "loss_series_names"]


def loss_series_names() -> List[str]:
    """reference train.py:300-308 ``build_names``."""
    return [
        f"loss_stage{stage}_L{branch}"
        for stage in range(1, 7)
        for branch in (1, 2)
    ]


def cpm_loss(
    saved_for_loss: List[jnp.ndarray],
    heatmap_target: jnp.ndarray,
    paf_target: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """``saved_for_loss`` is the 12-output list [paf1, ht1, ..., paf6, ht6]
    (NHWC); targets are [B, H, W, 38] / [B, H, W, 19]."""
    batch = heatmap_target.shape[0]
    names = loss_series_names()
    logs: Dict[str, jnp.ndarray] = {}
    total = 0.0
    for stage in range(6):
        paf_pred = saved_for_loss[2 * stage].astype(jnp.float32)
        ht_pred = saved_for_loss[2 * stage + 1].astype(jnp.float32)
        l1 = jnp.sum((paf_pred - paf_target) ** 2)
        l2 = jnp.sum((ht_pred - heatmap_target) ** 2)
        total = total + l1 + l2
        logs[names[2 * stage]] = l1
        logs[names[2 * stage + 1]] = l2
    total = total / batch

    final_ht = saved_for_loss[-1].astype(jnp.float32)
    final_paf = saved_for_loss[-2].astype(jnp.float32)
    logs["max_ht"] = jnp.max(final_ht[..., :-1])   # excl. background
    logs["min_ht"] = jnp.min(final_ht[..., :-1])
    logs["max_paf"] = jnp.max(final_paf)
    logs["min_paf"] = jnp.min(final_paf)
    return total, logs
