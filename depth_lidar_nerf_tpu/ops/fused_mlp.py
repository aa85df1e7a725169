"""Fused NeRF-MLP Pallas kernel (v3: packed-lane inputs), fwd + custom VJP.

Why: profiling (PERF.md) shows the train step is ~92% MLP, and naive kernel
integrations lost their wins to HBM glue — separate [P, 63]/[P, 27] embedding
tensors are lane-padded to 128 by the (8,128) TPU tiling (up to 4x bandwidth
bloat), and the per-ray view encoding broadcast materialized another [P, 27].

v3 design: the wrapper packs BOTH encodings into ONE [P, 128] bfloat16 tensor
(63 position lanes + 27 view lanes + 38 zero lanes — zero physical waste, and
XLA fuses sin/cos + broadcast + concat + cast into the single packing write).
The kernel consumes the packed block directly:

- first trunk layer: ``h1 = packed @ W1'`` where ``W1'`` is the flax kernel
  with zero rows for the view/pad lanes — mathematically identical;
- view layer: ``hv = relu(concat(feature, packed) @ Wv')`` with ``Wv'`` rows
  arranged [feature | zeros(pts lanes) | view rows | zeros] — the packed
  block rides along, no slicing or broadcasting;
- sigma rides the feature matmul as output column width+3 of a
  [W, W+8] weight; rgb lands in columns 0..2 of the [T, 8] output.

Backward is **recompute**: the backward kernel re-runs the forward in VMEM
(no saved activations -> no HBM activation traffic; ~4x larger ray batches
fit than the XLA path) and accumulates float32 weight grads across the
sequential TPU grid. Inputs are training data — their cotangents are
identically zero (fine z samples are stop_gradient'ed, run_nerf.py:634).

Mosaic gotchas honored here (found the hard way, see PERF.md): f32 masks for
ReLU backward (no bf16 compares), no broadcast+reshape (not needed in v3),
weight-grad accumulation into constant-index output blocks.

Supported topology (the flagship fern_dsnerf/KITTI shape): trunk depth <= 4
(no live skip), viewdirs on, no semantic head, no frozen sigma, width
128/256, encoded width <= 128 lanes. Everything else falls back to Flax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
_TILE = int(os.environ.get("DLNERF_FUSED_TILE", 2048))  # points per grid step
_OUT = 8  # padded raw output (rgb 0:3, sigma 3)
_PACK = 128  # packed encoding lanes


def interpret_mode() -> bool:
    """Run the fused kernels through the Pallas interpreter (any backend).

    Read at call time so the multichip dryrun / CPU-mesh tests can flip it
    after import; on real TPU hardware it stays off.
    """
    return os.environ.get("DLNERF_PALLAS_INTERPRET", "0") == "1"


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t_a(a, b):  # a^T @ b over the tile dim
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_b_t(a, b):  # a @ b^T
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _forward_tile(depth, dtype, x, ws):
    """x: packed [T, 128] bf16. Returns (out [T, 8] f32, activations)."""
    (w1, b1, tw, tb, wfs, bfs, wv, bv, wr, br) = ws
    W = wfs.shape[0]

    h = jnp.maximum(_dot(x, w1) + b1, 0.0).astype(dtype)
    acts = [h]
    for i in range(depth - 1):
        h = jnp.maximum(_dot(h, tw[i]) + tb[i], 0.0).astype(dtype)
        acts.append(h)

    fs = _dot(h, wfs) + bfs  # [T, W + 8]
    feat = fs[:, :W].astype(dtype)
    sig8 = fs[:, W:W + _OUT]  # sigma in col 3

    hv_in = jnp.concatenate([feat, x], axis=-1)  # [T, W + 128]
    hv = jnp.maximum(_dot(hv_in, wv) + bv, 0.0).astype(dtype)

    out = _dot(hv, wr) + br + sig8  # [T, 8] f32
    return out, (acts, feat, hv_in, hv)


def _unflatten(flat, depth):
    w1, b1 = flat[0], flat[1]
    tw = list(flat[2:2 + depth - 1])
    tb = list(flat[2 + depth - 1:2 + 2 * (depth - 1)])
    wfs, bfs, wv, bv, wr, br = flat[2 + 2 * (depth - 1):]
    return (w1, b1, tw, tb, wfs, bfs, wv, bv, wr, br)


def _n_ws(depth):
    return 2 + 2 * (depth - 1) + 6


def _fwd_kernel(depth, dtype, x_ref, *refs):
    out_ref = refs[-1]
    ws = _unflatten([r[:] for r in refs[:-1]], depth)
    out, _ = _forward_tile(depth, dtype, x_ref[:], ws)
    out_ref[:] = out


def _bwd_kernel(depth, dtype, x_ref, g_ref, *refs):
    n_w = _n_ws(depth)
    w_refs, d_refs = refs[:n_w], refs[n_w:]
    ws = _unflatten([r[:] for r in w_refs], depth)
    (w1, b1, tw, tb, wfs, bfs, wv, bv, wr, br) = ws
    W = wfs.shape[0]

    x = x_ref[:]
    g = g_ref[:].astype(jnp.float32)
    _, (acts, feat, hv_in, hv) = _forward_tile(depth, dtype, x, ws)

    i = pl.program_id(0)

    def acc(ref, val):
        @pl.when(i == 0)
        def _():
            ref[:] = val

        @pl.when(i != 0)
        def _():
            ref[:] = ref[:] + val

    gb = g.astype(dtype)
    dwr = _dot_t_a(hv, gb)
    dbr = jnp.sum(g, 0, keepdims=True)

    dhv = _dot_b_t(gb, wr)
    dhv = jnp.where(hv.astype(jnp.float32) > 0, dhv, 0.0).astype(dtype)
    dwv = _dot_t_a(hv_in, dhv)
    dbv = jnp.sum(dhv.astype(jnp.float32), 0, keepdims=True)

    dfeat = _dot_b_t(dhv, wv[:W]).astype(dtype)  # [T, W]
    h_last = acts[-1]
    dwfs = jnp.concatenate([_dot_t_a(h_last, dfeat), _dot_t_a(h_last, gb)],
                           axis=1)  # [W, W + 8]
    dbfs = jnp.concatenate([
        jnp.sum(dfeat.astype(jnp.float32), 0, keepdims=True),
        jnp.sum(g, 0, keepdims=True)], axis=1)

    dh = _dot_b_t(dfeat, wfs[:, :W]) + _dot_b_t(gb, wfs[:, W:])
    dtw = [None] * (depth - 1)
    dtb = [None] * (depth - 1)
    for li in range(depth - 1, 0, -1):
        dh = jnp.where(acts[li].astype(jnp.float32) > 0, dh, 0.0).astype(dtype)
        dtw[li - 1] = _dot_t_a(acts[li - 1], dh)
        dtb[li - 1] = jnp.sum(dh.astype(jnp.float32), 0, keepdims=True)
        dh = _dot_b_t(dh, tw[li - 1])
    dh = jnp.where(acts[0].astype(jnp.float32) > 0, dh, 0.0).astype(dtype)
    dw1 = _dot_t_a(x, dh)
    db1 = jnp.sum(dh.astype(jnp.float32), 0, keepdims=True)

    flat = [dw1, db1, *dtw, *dtb, dwfs, dbfs, dwv, dbv, dwr, dbr]
    for ref, val in zip(d_refs, flat):
        acc(ref, val)


# --------------------------------------------------------------- packing

def supports(params, use_viewdirs: bool, num_semantic: int, depth: int,
             width: int, S: int, multires: int, multires_views: int,
             skips=()) -> bool:
    """Whether the (v3 packed-encoding) fused kernel covers this model shape.

    Live skip concats (any ``s in skips`` with ``s < depth - 1``) are v4-only
    (``fused_mlp_t.supports_rays``); this kernel rejects them. A skip at
    ``s == depth - 1`` concats into the HEADS (feature/sigma kernels widen to
    ``[e_p + W, .]``) — no fused variant implements that, so it must be
    rejected here too (``_pack_params`` would crash at dispatch otherwise),
    matching ``supports_rays``/``supports_semantic``."""
    if not use_viewdirs or num_semantic > 0 or depth > 4 or depth < 1:
        return False
    if any(0 <= s < depth for s in (skips or ())):
        return False
    if S != -1 and (S <= 0 or _TILE % S != 0):
        return False  # S=-1: defer the sample-count check to apply time
    e_p, e_v = 3 + 6 * multires, 3 + 6 * multires_views
    if e_p + e_v > _PACK:
        return False
    p = params["params"] if "params" in params else params
    if "semantic_0" in p:
        return False
    if p["trunk_0"]["kernel"].shape[0] != e_p:
        return False
    if p["views_0"]["kernel"].shape[0] != width + e_v:
        return False
    return p["trunk_0"]["kernel"].shape[1] == width and width in (128, 256)


def _pack_params(params, depth: int, e_p: int, e_v: int, dtype):
    """NeRFMLP param tree -> packed-lane weight list."""
    p = params["params"] if "params" in params else params
    W = p["trunk_0"]["kernel"].shape[1]

    w1 = jnp.zeros((_PACK, W), dtype).at[:e_p].set(
        p["trunk_0"]["kernel"].astype(dtype))
    b1 = p["trunk_0"]["bias"].astype(jnp.float32)[None]

    tw = [p[f"trunk_{i}"]["kernel"].astype(dtype) for i in range(1, depth)]
    tb = [p[f"trunk_{i}"]["bias"].astype(jnp.float32)[None]
          for i in range(1, depth)]

    wfs = jnp.zeros((W, W + _OUT), dtype)
    wfs = wfs.at[:, :W].set(p["feature"]["kernel"].astype(dtype))
    wfs = wfs.at[:, W + 3:W + 4].set(p["sigma"]["kernel"].astype(dtype))
    bfs = jnp.zeros((1, W + _OUT), jnp.float32)
    bfs = bfs.at[0, :W].set(p["feature"]["bias"].astype(jnp.float32))
    bfs = bfs.at[0, W + 3].set(p["sigma"]["bias"].astype(jnp.float32)[0])

    wv_flax = p["views_0"]["kernel"].astype(dtype)  # [W + e_v, W//2]
    wv = jnp.zeros((W + _PACK, W // 2), dtype)
    wv = wv.at[:W].set(wv_flax[:W])
    wv = wv.at[W + e_p:W + e_p + e_v].set(wv_flax[W:])
    bv = p["views_0"]["bias"].astype(jnp.float32)[None]

    wr = jnp.pad(p["rgb"]["kernel"].astype(dtype), ((0, 0), (0, _OUT - 3)))
    br = jnp.zeros((1, _OUT), jnp.float32).at[0, :3].set(
        p["rgb"]["bias"].astype(jnp.float32))
    return [w1, b1, *tw, *tb, wfs, bfs, wv, bv, wr, br]


def _unpack_grads(dws, params, depth: int, e_p: int, e_v: int):
    p = params["params"] if "params" in params else params
    W = p["trunk_0"]["kernel"].shape[1]
    (dw1, db1) = dws[:2]
    dtw = dws[2:2 + depth - 1]
    dtb = dws[2 + depth - 1:2 + 2 * (depth - 1)]
    dwfs, dbfs, dwv, dbv, dwr, dbr = dws[2 + 2 * (depth - 1):]

    def cast_like(val, ref):
        return val.astype(ref.dtype)

    out = {"trunk_0": {"kernel": cast_like(dw1[:e_p], p["trunk_0"]["kernel"]),
                       "bias": cast_like(db1[0], p["trunk_0"]["bias"])}}
    for i in range(1, depth):
        out[f"trunk_{i}"] = {
            "kernel": cast_like(dtw[i - 1], p[f"trunk_{i}"]["kernel"]),
            "bias": cast_like(dtb[i - 1][0], p[f"trunk_{i}"]["bias"])}
    out["feature"] = {"kernel": cast_like(dwfs[:, :W], p["feature"]["kernel"]),
                      "bias": cast_like(dbfs[0, :W], p["feature"]["bias"])}
    out["sigma"] = {
        "kernel": cast_like(dwfs[:, W + 3:W + 4], p["sigma"]["kernel"]),
        "bias": cast_like(dbfs[0, W + 3:W + 4], p["sigma"]["bias"])}
    out["views_0"] = {
        "kernel": cast_like(
            jnp.concatenate([dwv[:W], dwv[W + e_p:W + e_p + e_v]], axis=0),
            p["views_0"]["kernel"]),
        "bias": cast_like(dbv[0], p["views_0"]["bias"])}
    out["rgb"] = {"kernel": cast_like(dwr[:, :3], p["rgb"]["kernel"]),
                  "bias": cast_like(dbr[0, :3], p["rgb"]["bias"])}
    return {"params": out} if "params" in params else out


def _full_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _fused_packed(params, packed, depth, e_p, e_v, dtype):
    return _fwd_impl(params, packed, depth, e_p, e_v, dtype)


def _fwd_impl(params, packed, depth, e_p, e_v, dtype):
    ws = _pack_params(params, depth, e_p, e_v, dtype)
    P = packed.shape[0]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, depth, dtype),
        grid=(P // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, _PACK), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[_full_spec(w.shape) for w in ws],
        ],
        out_specs=pl.BlockSpec((_TILE, _OUT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, _OUT), jnp.float32),
        interpret=interpret_mode(),
    )(packed, *ws)


def _vjp_fwd(params, packed, depth, e_p, e_v, dtype):
    return _fwd_impl(params, packed, depth, e_p, e_v, dtype), (params, packed)


def _vjp_bwd(depth, e_p, e_v, dtype, res, g):
    params, packed = res
    ws = _pack_params(params, depth, e_p, e_v, dtype)
    P = packed.shape[0]
    d_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
    dws = pl.pallas_call(
        functools.partial(_bwd_kernel, depth, dtype),
        grid=(P // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, _PACK), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, _OUT), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[_full_spec(w.shape) for w in ws],
        ],
        out_specs=tuple(_full_spec(w.shape) for w in ws),
        out_shape=tuple(d_shapes),
        interpret=interpret_mode(),
    )(packed, g, *ws)
    d_params = _unpack_grads(list(dws), params, depth, e_p, e_v)
    # Inputs are training data; cotangents are zero and DCE'd by XLA.
    return d_params, jnp.zeros_like(packed)


_fused_packed.defvjp(_vjp_fwd, _vjp_bwd)


def fused_nerf_apply_raw(params, pts, viewdirs, *, depth, width, multires,
                         multires_views, dtype=jnp.bfloat16, mesh=None,
                         ray_axis="rays"):
    """Raw-input fast path: ``pts [N, S, 3]``, unit ``viewdirs [N, 3]`` ->
    raw ``[N, S, 4]``.

    The positional/view encodings are computed in XLA (f32 sin/cos) and fused
    into one packed [P, 128] bfloat16 write; the kernel does the rest.
    With a multi-device ``mesh`` the call is shard_mapped over the ray axis
    (see ``fused_mlp_t.fused_nerf_apply_rays``); needs ``N % mesh.size == 0``.
    """
    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P_

        core = functools.partial(
            fused_nerf_apply_raw, depth=depth, width=width, multires=multires,
            multires_views=multires_views, dtype=dtype)
        return jax.shard_map(
            core, mesh=mesh,
            in_specs=(P_(), P_(ray_axis), P_(ray_axis)),
            out_specs=P_(ray_axis),
            check_vma=False,
        )(params, pts, viewdirs)
    from depth_lidar_nerf_tpu.ops.embedding import positional_encoding

    N, S, _ = pts.shape
    e_p, e_v = 3 + 6 * multires, 3 + 6 * multires_views

    rays_per_tile = _TILE // S
    n_pad = (-N) % rays_per_tile
    n_full = N + n_pad
    if n_pad:
        pts = jnp.pad(pts, ((0, n_pad), (0, 0), (0, 0)))
        viewdirs = jnp.pad(viewdirs, ((0, n_pad), (0, 0)))

    pe = positional_encoding(pts.astype(jnp.float32), multires).astype(dtype)
    ve = positional_encoding(viewdirs.astype(jnp.float32),
                             multires_views).astype(dtype)
    packed = jnp.concatenate([
        pe,
        jnp.broadcast_to(ve[:, None, :], (n_full, S, e_v)),
        jnp.zeros((n_full, S, _PACK - e_p - e_v), dtype),
    ], axis=-1).reshape(n_full * S, _PACK)

    raw = _fused_packed(params, packed, depth, e_p, e_v, dtype)
    out = raw.reshape(n_full, S, _OUT)[:, :, :4]
    return out[:N] if n_pad else out
