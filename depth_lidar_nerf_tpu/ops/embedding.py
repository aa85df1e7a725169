"""Frequency positional encoding.

Matches the NeRF encoding contract of the reference (``run_nerf_helpers.py:25-73``):
identity plus ``sin``/``cos`` over octave bands ``2^0 .. 2^(multires-1)``,
laid out per-frequency as ``[x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...]``
with each block covering all input dims.

Unlike the reference (a list of Python lambdas concatenated per call), this is
a single broadcast + sin/cos that XLA fuses into the consuming matmul.
"""

from __future__ import annotations

import jax.numpy as jnp


def embedding_dim(input_dims: int, num_freqs: int, include_input: bool = True) -> int:
    """Output channel count: e.g. 3 dims, 10 freqs -> 63; 3 dims, 4 freqs -> 27."""
    out = input_dims if include_input else 0
    return out + input_dims * 2 * num_freqs


def positional_encoding(
    x: jnp.ndarray,
    num_freqs: int,
    include_input: bool = True,
    log_sampling: bool = True,
) -> jnp.ndarray:
    """Encode ``x[..., d] -> [..., embedding_dim(d, num_freqs)]``.

    ``num_freqs == 0`` degenerates to identity, which is the reference's
    ``i_embed == -1`` path (``run_nerf_helpers.py:59-60``).
    """
    if num_freqs == 0:
        return x
    d = x.shape[-1]
    if log_sampling:
        freqs = 2.0 ** jnp.linspace(0.0, num_freqs - 1, num_freqs, dtype=x.dtype)
    else:
        freqs = jnp.linspace(2.0**0, 2.0 ** (num_freqs - 1), num_freqs, dtype=x.dtype)
    xf = x[..., None, :] * freqs[:, None]  # [..., F, d]
    # [..., F, 2, d] -> flat: per-frequency (sin triple, cos triple), matching
    # the reference's embed_fns ordering.
    enc = jnp.stack([jnp.sin(xf), jnp.cos(xf)], axis=-2)
    enc = enc.reshape(*x.shape[:-1], num_freqs * 2 * d)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
