"""Min-background merge of several class-score maps.

jnp port of the reference's MergePrediction Python layer
(/root/reference/lib/layers/merge_prediction.py:16-53): given N score maps
for the same spatial grid, softmax each over the 2-way class axis, take the
smallest background probability per position ("strongest" prediction), and
emit the merged (bg, 1-bg) map. Available for model surgery; not referenced
by any shipped template.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def merge_prediction(score_maps):
    """score_maps: (N, 2, H', W) raw logits stacked over sources (the
    Caffe blob layout with 2-way class channels). Returns (1, 2, H', W)
    merged probabilities."""
    x = jnp.asarray(score_maps)
    n, c, h, w = x.shape
    probs = jax.nn.softmax(x.reshape(n, 2, -1, w), axis=1)
    bg = probs[:, 0]
    strongest = bg.min(axis=0)
    merged = jnp.stack([strongest, 1.0 - strongest])
    return merged.reshape(1, 2, h, w)
