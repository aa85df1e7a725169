"""Import original-NeRF Keras weight lists into the Flax param tree.

Parity: ``NeRF.load_weights_from_keras`` (``run_nerf_helpers.py:147-174``) —
the original TF NeRF released weights as a flat numpy list
[W0, b0, W1, b1, ..., feature_W, feature_b, views_W, views_b, rgb_W, rgb_b,
alpha_W, alpha_b]. The torch reference transposes each W; Keras stores
[in, out] which is already the Flax convention, so kernels copy straight in.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def load_weights_from_keras(params, weights, depth: int):
    """Return a params tree with weights from the Keras list."""
    weights = [np.asarray(w) for w in weights]
    p = {"params": {}} if "params" in params else {}
    tree = dict(params["params"] if "params" in params else params)

    def put(name, w, b):
        tree[name] = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b).reshape(-1)}

    for i in range(depth):
        put(f"trunk_{i}", weights[2 * i], weights[2 * i + 1])
    put("feature", weights[2 * depth], weights[2 * depth + 1])
    put("views_0", weights[2 * depth + 2], weights[2 * depth + 3])
    put("rgb", weights[2 * depth + 4], weights[2 * depth + 5])
    put("sigma", weights[2 * depth + 6], weights[2 * depth + 7])
    return {"params": tree} if "params" in params else tree
