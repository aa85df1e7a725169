"""Fused NeRF-MLP Pallas kernel (forward + custom-VJP backward).

Why: the NeRF MLP is a chain of small-width matmuls. Lowered layer-by-layer by
XLA, every layer's [P, W] activation round-trips HBM, capping throughput at
the bandwidth roofline (~52 TFLOP/s on v5e for W=256 bf16 — measured ~60
including fusion wins). This kernel keeps the whole per-tile activation set
resident in VMEM: HBM traffic collapses to (embedded inputs + 16B/point
output + weight grads), making the step MXU-bound.

Backward strategy: **recompute** — the backward kernel re-runs the forward for
its tile entirely in VMEM (≈33% extra FLOPs) instead of saving activations to
HBM (which would reinstate the bandwidth wall). Weight gradients accumulate
in float32 across the (sequential on TPU) grid into constant-index output
blocks.

Supported topology (the flagship fern_dsnerf/KITTI shape, run_nerf.py:398 +
configs/fern_dsnerf.txt): trunk depth <= 4 (no live skip), viewdir branch, no
semantic head, no frozen-sigma. Other shapes fall back to the plain Flax
module (models/nerf_mlp.py).

Weight layout (prepared by :func:`_pack_params` from the standard NeRFMLP
param tree): all matmuls padded so outputs land in aligned lanes —
``Ws`` places sigma in output column 3, ``Wr`` places rgb in columns 0..2, so
``raw = hv @ Wr + h4 @ Ws + bias`` with no in-kernel scatter.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile of points processed per grid step.
_TILE = 1024
_E_PTS = 64   # padded positional-encoding width (63 -> 64)
_E_VIEW = 32  # padded view-encoding width (27 -> 32)
_OUT = 8      # padded raw output width (rgb 0:3, sigma 3)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t_a(a, b):
    """a^T @ b contracting the batch (tile) dimension: [T,M],[T,N] -> [M,N]."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_b_t(a, b):
    """a @ b^T: [T,N],[M,N] -> [T,M]."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _forward_tile(x, v, ws, depth):
    """Shared forward math on one VMEM-resident tile. Returns (raw, acts)."""
    (tw, tb, wf, bf, wsig, bsig, wv, bv, wr, br) = ws
    h = x
    acts = []
    for i in range(depth):
        h = jnp.maximum(_dot(h, tw[i]) + tb[i], 0.0).astype(x.dtype)
        acts.append(h)
    feat = (_dot(h, wf) + bf).astype(x.dtype)
    sig8 = _dot(h, wsig) + bsig  # [T, 8] (sigma in col 3)
    hv_in = jnp.concatenate([feat, v], axis=-1)
    hv = jnp.maximum(_dot(hv_in, wv) + bv, 0.0).astype(x.dtype)
    raw = (_dot(hv, wr) + br) + sig8  # [T, 8] f32
    return raw, (acts, feat, hv_in, hv)


def _fwd_kernel(depth, x_ref, v_ref, *w_refs):
    out_ref = w_refs[-1]
    ws = _unflatten_ws([r[:] for r in w_refs[:-1]], depth)
    raw, _ = _forward_tile(x_ref[:], v_ref[:], ws, depth)
    out_ref[:] = raw


def _unflatten_ws(flat, depth):
    tw = list(flat[:depth])
    tb = list(flat[depth:2 * depth])
    wf, bf, wsig, bsig, wv, bv, wr, br = flat[2 * depth:]
    return (tw, tb, wf, bf, wsig, bsig, wv, bv, wr, br)


def _bwd_kernel(depth, x_ref, v_ref, g_ref, *refs):
    n_w = 2 * depth + 8
    w_refs = refs[:n_w]
    d_refs = refs[n_w:]
    ws = _unflatten_ws([r[:] for r in w_refs], depth)
    (tw, tb, wf, bf, wsig, bsig, wv, bv, wr, br) = ws

    x = x_ref[:]
    v = v_ref[:]
    g = g_ref[:].astype(jnp.float32)  # [T, 8]

    # Recompute forward (activations live only in VMEM).
    _, (acts, feat, hv_in, hv) = _forward_tile(x, v, ws, depth)

    i = pl.program_id(0)

    def acc(ref, val):
        @pl.when(i == 0)
        def _():
            ref[:] = val

        @pl.when(i != 0)
        def _():
            ref[:] = ref[:] + val

    gb = g.astype(x.dtype)
    # rgb head: raw += hv @ wr + br
    acc(d_refs[2 * depth + 6], _dot_t_a(hv, gb))          # dWr
    acc(d_refs[2 * depth + 7], jnp.sum(g, 0, keepdims=True))  # dbr
    # sigma head: raw += h4 @ wsig + bsig
    h_last = acts[-1]
    acc(d_refs[2 * depth + 2], _dot_t_a(h_last, gb))      # dWsig
    acc(d_refs[2 * depth + 3], jnp.sum(g, 0, keepdims=True))  # dbsig

    # view layer
    dhv = _dot_b_t(gb, wr)  # [T, 128] f32
    # Mosaic has no bf16 compare; mask in f32.
    dhv = jnp.where(hv.astype(jnp.float32) > 0, dhv, 0.0).astype(x.dtype)
    acc(d_refs[2 * depth + 4], _dot_t_a(hv_in, dhv))      # dWv
    acc(d_refs[2 * depth + 5], jnp.sum(dhv.astype(jnp.float32), 0, keepdims=True))
    dhv_in = _dot_b_t(dhv, wv)  # [T, 256 + E_VIEW]
    dfeat = dhv_in[:, : feat.shape[-1]].astype(x.dtype)

    # feature layer
    acc(d_refs[2 * depth], _dot_t_a(h_last, dfeat))       # dWf
    acc(d_refs[2 * depth + 1],
        jnp.sum(dfeat.astype(jnp.float32), 0, keepdims=True))

    # trunk
    dh = (_dot_b_t(dfeat, wf) + _dot_b_t(gb, wsig)).astype(jnp.float32)
    for li in range(depth - 1, -1, -1):
        dh = jnp.where(acts[li].astype(jnp.float32) > 0, dh, 0.0).astype(x.dtype)
        h_prev = x if li == 0 else acts[li - 1]
        acc(d_refs[li], _dot_t_a(h_prev, dh))             # dW trunk li
        acc(d_refs[depth + li],
            jnp.sum(dh.astype(jnp.float32), 0, keepdims=True))
        if li > 0:
            dh = _dot_b_t(dh, tw[li]).astype(jnp.float32)


def _pad_to(x, rows=None, cols=None):
    r = 0 if rows is None else rows - x.shape[0]
    if x.ndim == 1:
        return jnp.pad(x, (0, r))
    c = 0 if cols is None else cols - x.shape[1]
    return jnp.pad(x, ((0, r), (0, c)))


def supports(params, use_viewdirs: bool, num_semantic: int, depth: int,
             width: int) -> bool:
    """Whether the fused kernel covers this model shape."""
    if not use_viewdirs or num_semantic > 0 or depth > 4:
        return False
    p = params["params"] if "params" in params else params
    if "semantic_0" in p:
        return False
    return p["trunk_0"]["kernel"].shape[1] == width and width in (128, 256)


def _pack_params(params, depth: int, dtype):
    """NeRFMLP param tree -> the padded flat weight list the kernels take."""
    p = params["params"] if "params" in params else params
    tw = [p[f"trunk_{i}"]["kernel"].astype(dtype) for i in range(depth)]
    tw[0] = _pad_to(tw[0], rows=_E_PTS)
    tb = [p[f"trunk_{i}"]["bias"].astype(jnp.float32)[None, :] for i in range(depth)]
    wf = p["feature"]["kernel"].astype(dtype)
    bf = p["feature"]["bias"].astype(jnp.float32)[None, :]
    # sigma -> output column 3 of an [W, 8] matmul
    wsig_col = p["sigma"]["kernel"].astype(dtype)  # [W, 1]
    wsig = jnp.zeros((wf.shape[0], _OUT), dtype).at[:, 3:4].set(wsig_col)
    bsig = jnp.zeros((1, _OUT), jnp.float32).at[0, 3].set(
        p["sigma"]["bias"].astype(jnp.float32)[0])
    wv = _pad_to(p["views_0"]["kernel"].astype(dtype),
                 rows=wf.shape[1] + _E_VIEW)
    bv = p["views_0"]["bias"].astype(jnp.float32)[None, :]
    wr = _pad_to(p["rgb"]["kernel"].astype(dtype), cols=_OUT)  # [128, 8]
    br = jnp.zeros((1, _OUT), jnp.float32).at[0, :3].set(
        p["rgb"]["bias"].astype(jnp.float32))
    return [*tw, *tb, wf, bf, wsig, bsig, wv, bv, wr, br]


def _unpack_grads(dws, params, depth: int):
    """Flat padded grad list -> NeRFMLP param-tree cotangent."""
    p = params["params"] if "params" in params else params
    out = {}
    for i in range(depth):
        out[f"trunk_{i}"] = {
            "kernel": dws[i][: p[f"trunk_{i}"]["kernel"].shape[0]].astype(
                p[f"trunk_{i}"]["kernel"].dtype),
            "bias": dws[depth + i][0].astype(p[f"trunk_{i}"]["bias"].dtype),
        }
    wf_g, bf_g, wsig_g, bsig_g, wv_g, bv_g, wr_g, br_g = dws[2 * depth:]
    out["feature"] = {"kernel": wf_g.astype(p["feature"]["kernel"].dtype),
                      "bias": bf_g[0].astype(p["feature"]["bias"].dtype)}
    out["sigma"] = {"kernel": wsig_g[:, 3:4].astype(p["sigma"]["kernel"].dtype),
                    "bias": bsig_g[0, 3:4].astype(p["sigma"]["bias"].dtype)}
    out["views_0"] = {
        "kernel": wv_g[: p["views_0"]["kernel"].shape[0]].astype(
            p["views_0"]["kernel"].dtype),
        "bias": bv_g[0].astype(p["views_0"]["bias"].dtype)}
    out["rgb"] = {"kernel": wr_g[:, :3].astype(p["rgb"]["kernel"].dtype),
                  "bias": br_g[0, :3].astype(p["rgb"]["bias"].dtype)}
    return {"params": out} if "params" in params else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_raw(params, x, v, depth, dtype):
    return _fused_fwd_impl(params, x, v, depth, dtype)


def _fused_fwd_impl(params, x, v, depth, dtype):
    ws = _pack_params(params, depth, dtype)
    P = x.shape[0]
    grid = P // _TILE
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim, memory_space=pltpu.VMEM)
        for w in ws
    ]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, depth),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE, _E_PTS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, _E_VIEW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((_TILE, _OUT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, _OUT), jnp.float32),
    )(x, v, *ws)
    return out


def _fused_vjp_fwd(params, x, v, depth, dtype):
    return _fused_fwd_impl(params, x, v, depth, dtype), (params, x, v)


def _fused_vjp_bwd(depth, dtype, res, g):
    params, x, v = res
    ws = _pack_params(params, depth, dtype)
    P = x.shape[0]
    grid = P // _TILE
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim, memory_space=pltpu.VMEM)
        for w in ws
    ]
    d_specs = [
        pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim, memory_space=pltpu.VMEM)
        for w in ws
    ]
    d_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
    dws = pl.pallas_call(
        functools.partial(_bwd_kernel, depth),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE, _E_PTS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, _E_VIEW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, _OUT), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=tuple(d_specs),
        out_shape=tuple(d_shapes),
    )(x, v, g, *ws)
    d_params = _unpack_grads(list(dws), params, depth)
    # Points/viewdirs are training data, never differentiated (fine z samples
    # are stop_gradient'ed upstream, run_nerf.py:634). Return zeros; XLA DCEs
    # them.
    return d_params, jnp.zeros_like(x), jnp.zeros_like(v)


_fused_raw.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def fused_nerf_apply(params, pts_embed: jnp.ndarray, views_embed: jnp.ndarray,
                     depth: int, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Drop-in for ``NeRFMLP.apply`` on supported shapes.

    ``pts_embed [..., 63]``, ``views_embed [..., 27]`` -> raw ``[..., 4]``.
    """
    lead = pts_embed.shape[:-1]
    x = pts_embed.reshape(-1, pts_embed.shape[-1])
    v = views_embed.reshape(-1, views_embed.shape[-1])
    P = x.shape[0]
    pad = (-P) % _TILE
    x = jnp.pad(x.astype(dtype), ((0, pad), (0, _E_PTS - x.shape[-1])))
    v = jnp.pad(v.astype(dtype), ((0, pad), (0, _E_VIEW - v.shape[-1])))
    raw = _fused_raw(params, x, v, depth, dtype)
    return raw[:P, :4].reshape(*lead, 4)
