"""Fused NeRF-MLP Pallas kernel: positional encoding + MLP, fwd + custom VJP.

Why: profiling the train step (see bench notes in the repo log) shows it is
~92% MLP time, and with a naive kernel ~40% of the step was *glue* around the
kernels — materializing the [P, 63] / [P, 27] embeddings, broadcasting
per-ray view encodings to per-point, casting, and padding. This kernel
consumes RAW positions [P, 4] and PER-RAY view directions [R, 4] and does
everything on-chip:

- **In-kernel frequency encoding.** ``xf = x @ F`` where ``F`` spreads the
  octave bands (an MXU matmul), then ``sin``/``cos`` on the VPU. The flax
  embedding layout interleaves (sin, cos) per frequency; since the encoding
  feeds a *learned* matmul, the first-layer weights are row-permuted on the
  host instead (``_perm_*``), so the kernel's [x | sin | cos] block layout is
  exactly equivalent.
- **Per-ray view branch.** The view-direction part of the view layer is
  computed once per ray ([R, 128]) and repeated to points via a VMEM
  broadcast-reshape — the [P, 27] HBM broadcast never exists.
- **Merged heads.** Sigma rides the feature matmul as output column 256+3 of
  a [256, 384] weight (saving a separate MXU pass); rgb lands in columns 0..2
  of the [T, 8] output block.
- **Recompute backward.** The backward kernel re-runs the forward in VMEM
  (no saved activations -> no HBM activation traffic, and ~4x larger ray
  batches fit vs the XLA path) and accumulates float32 weight grads across
  the sequential TPU grid. Positions/viewdirs are training data; their
  cotangents are identically zero (fine z samples are stop_gradient'ed
  upstream, run_nerf.py:634).

Supported topology (the flagship fern_dsnerf/KITTI shape): trunk depth <= 4
(no live skip), viewdirs on, no semantic head, no frozen sigma, width
128/256, sample count dividing the 1024-point tile. Everything else falls
back to the Flax module.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 1024  # points per grid step
_OUT = 8  # padded raw output (rgb 0:3, sigma 3)


# ---------------------------------------------------------------- layouts

def _enc_perm(n_freq: int) -> np.ndarray:
    """kernel-order row index for each flax-order embedding row.

    flax (run_nerf_helpers.py:25-55): [x(3), sin f0(3), cos f0(3), sin f1...]
    kernel: [x(3), sin f0..f{n-1} (3n), cos f0..f{n-1} (3n)].
    Returns ``perm`` with kernel_row = perm[flax_row].
    """
    perm = np.zeros(3 + 6 * n_freq, np.int64)
    perm[:3] = np.arange(3)
    for f in range(n_freq):
        for d in range(3):
            perm[3 + 6 * f + d] = 3 + 3 * f + d  # sin block
            perm[6 + 6 * f + d] = 3 + 3 * n_freq + 3 * f + d  # cos block
    return perm


def _freq_matrix(n_freq: int) -> np.ndarray:
    """[4, 3*n_freq] spreading x (col-3 padded) over octave bands:
    xf[:, 3f + d] = x[:, d] * 2^f."""
    F = np.zeros((4, 3 * n_freq), np.float32)
    for f in range(n_freq):
        for d in range(3):
            F[d, 3 * f + d] = 2.0**f
    return F


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t_a(a, b):  # a^T @ b over the tile dim
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_b_t(a, b):  # a @ b^T
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


class _Spec:
    """Static kernel geometry for one (depth, width, S, freqs) combination."""

    def __init__(self, depth, width, S, n_freq_p, n_freq_v, dtype):
        self.depth = depth
        self.width = width
        self.S = S
        self.R = _TILE // S  # rays per tile
        self.n_freq_p = n_freq_p
        self.n_freq_v = n_freq_v
        self.dtype = dtype
        self.perm_p = _enc_perm(n_freq_p)
        self.perm_v = _enc_perm(n_freq_v)


def _freq_matrix_in_kernel(n_freq: int):
    """Build the [4, 3n] frequency spread matrix with iota (pallas kernels
    cannot capture host constants)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (4, 3 * n_freq), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (4, 3 * n_freq), 1)
    octave = jnp.exp((cols // 3).astype(jnp.float32) * jnp.float32(np.log(2.0)))
    return jnp.where(rows == cols % 3, octave, 0.0)


def _expand_matrix(R, S, dtype):
    """[T, R] ray->point expansion: E[t, r] = 1 iff t // S == r. Used as an
    MXU matmul to repeat per-ray rows to per-point rows (Mosaic's reshape of
    a broadcast lowers incorrectly on TPU as of jax 0.9)."""
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (R * S, R), 0)
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (R * S, R), 1)
    return ((t_idx // S) == r_idx).astype(dtype)


def _expand(E, per_ray):
    return _dot(E, per_ray)  # [T, C] f32


def _encode(x4, n_freq, dtype):
    """[T, 4] f32 -> (x bf16 [T,4], sin [T,3n], cos [T,3n] bf16).

    The frequency spread MUST run at true f32 precision: at octave 2^9 a
    bf16-precision product is off by whole radians and the sin/cos encodings
    turn to noise (observed: default MXU f32 matmul uses bf16 passes).
    """
    xf = jnp.dot(x4, _freq_matrix_in_kernel(n_freq),
                 preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    return x4.astype(dtype), jnp.sin(xf).astype(dtype), jnp.cos(xf).astype(dtype)


def _forward_tile(spec: _Spec, pts, views, ws):
    (w1x, w1s, w1c, b1, tw, tb, wfs, bfs, wvf, wvv, wvs, wvc, bv, wr, br) = ws
    dt = spec.dtype

    xb, sp, cp = _encode(pts, spec.n_freq_p, dt)
    h = jnp.maximum(
        _dot(xb, w1x) + _dot(sp, w1s) + _dot(cp, w1c) + b1, 0.0).astype(dt)
    acts = [h]
    for i in range(spec.depth - 1):
        h = jnp.maximum(_dot(h, tw[i]) + tb[i], 0.0).astype(dt)
        acts.append(h)

    fs = _dot(h, wfs) + bfs  # [T, W + 8]
    feat = fs[:, : spec.width].astype(dt)
    sig8 = fs[:, spec.width : spec.width + _OUT]  # sigma in col 3

    vb, sv, cv = _encode(views, spec.n_freq_v, dt)
    hv_ray = (_dot(vb, wvv) + _dot(sv, wvs) + _dot(cv, wvc)).astype(dt)
    E = _expand_matrix(spec.R, spec.S, dt)
    hv_rep = _expand(E, hv_ray)  # [T, W/2] f32
    hv = jnp.maximum(_dot(feat, wvf) + hv_rep + bv, 0.0).astype(dt)

    out = _dot(hv, wr) + br + sig8  # [T, 8] f32
    return out, (xb, sp, cp, acts, feat, hv, vb, sv, cv)


def _n_ws(depth):
    # w1x w1s w1c b1 | (depth-1) tw | (depth-1) tb | wfs bfs wvf wvv wvs wvc bv wr br
    return 4 + 2 * (depth - 1) + 9


def _unflatten(flat, depth):
    w1x, w1s, w1c, b1 = flat[:4]
    tw = list(flat[4:4 + depth - 1])
    tb = list(flat[4 + depth - 1:4 + 2 * (depth - 1)])
    rest = flat[4 + 2 * (depth - 1):]
    wfs, bfs, wvf, wvv, wvs, wvc, bv, wr, br = rest
    return (w1x, w1s, w1c, b1, tw, tb, wfs, bfs, wvf, wvv, wvs, wvc, bv, wr, br)


def _fwd_kernel(spec: _Spec, pts_ref, views_ref, *refs):
    out_ref = refs[-1]
    ws = _unflatten([r[:] for r in refs[:-1]], spec.depth)
    out, _ = _forward_tile(spec, pts_ref[:], views_ref[:], ws)
    out_ref[:] = out


def _bwd_kernel(spec: _Spec, pts_ref, views_ref, g_ref, *refs):
    depth = spec.depth
    n_w = _n_ws(depth)
    w_refs, d_refs = refs[:n_w], refs[n_w:]
    ws = _unflatten([r[:] for r in w_refs], depth)
    (w1x, w1s, w1c, b1, tw, tb, wfs, bfs, wvf, wvv, wvs, wvc, bv, wr, br) = ws
    dt = spec.dtype

    g = g_ref[:].astype(jnp.float32)  # [T, 8]
    _, (xb, sp, cp, acts, feat, hv, vb, sv, cv) = _forward_tile(
        spec, pts_ref[:], views_ref[:], ws)

    i = pl.program_id(0)

    def acc(ref, val):
        @pl.when(i == 0)
        def _():
            ref[:] = val

        @pl.when(i != 0)
        def _():
            ref[:] = ref[:] + val

    gb = g.astype(dt)
    # Grad output layout mirrors the weight list.
    d = {}
    # rgb head
    d["wr"] = _dot_t_a(hv, gb)
    d["br"] = jnp.sum(g, 0, keepdims=True)

    # view layer
    dhv = _dot_b_t(gb, wr)
    dhv = jnp.where(hv.astype(jnp.float32) > 0, dhv, 0.0).astype(dt)
    d["wvf"] = _dot_t_a(feat, dhv)
    d["bv"] = jnp.sum(dhv.astype(jnp.float32), 0, keepdims=True)
    # per-ray pieces: reduce dhv to rays with E^T, then contract per-ray
    # encodings (dW = enc^T @ (E^T @ dhv) == rep(enc)^T @ dhv).
    E = _expand_matrix(spec.R, spec.S, dt)
    dhv_ray = _dot_t_a(E, dhv).astype(dt)  # [R, W/2]
    d["wvv"] = _dot_t_a(vb, dhv_ray)
    d["wvs"] = _dot_t_a(sv, dhv_ray)
    d["wvc"] = _dot_t_a(cv, dhv_ray)

    # feature + sigma (merged)
    dfeat = _dot_b_t(dhv, wvf).astype(dt)  # [T, W]
    h_last = acts[-1]
    d["wfs_f"] = _dot_t_a(h_last, dfeat)  # [W, W]
    d["wfs_s"] = _dot_t_a(h_last, gb)  # [W, 8]
    d["bfs_f"] = jnp.sum(dfeat.astype(jnp.float32), 0, keepdims=True)
    d["bfs_s"] = jnp.sum(g, 0, keepdims=True)

    # trunk
    wsig = wfs[:, spec.width:spec.width + _OUT]
    dh = _dot_b_t(dfeat, wfs[:, :spec.width]) + _dot_b_t(gb, wsig)
    d["tw"] = [None] * (depth - 1)
    d["tb"] = [None] * (depth - 1)
    for li in range(depth - 1, 0, -1):
        dh = jnp.where(acts[li].astype(jnp.float32) > 0, dh, 0.0).astype(dt)
        d["tw"][li - 1] = _dot_t_a(acts[li - 1], dh)
        d["tb"][li - 1] = jnp.sum(dh.astype(jnp.float32), 0, keepdims=True)
        dh = _dot_b_t(dh, tw[li - 1]).astype(jnp.float32)
    dh = jnp.where(acts[0].astype(jnp.float32) > 0, dh, 0.0).astype(dt)
    d["w1x"] = _dot_t_a(xb, dh)
    d["w1s"] = _dot_t_a(sp, dh)
    d["w1c"] = _dot_t_a(cp, dh)
    d["b1"] = jnp.sum(dh.astype(jnp.float32), 0, keepdims=True)

    # Assemble merged-head grads in the packed shapes so outputs mirror ws.
    dwfs = jnp.concatenate([d["wfs_f"], d["wfs_s"]], axis=1)
    dbfs = jnp.concatenate([d["bfs_f"], d["bfs_s"]], axis=1)
    flat = ([d["w1x"], d["w1s"], d["w1c"], d["b1"]] + d["tw"] + d["tb"]
            + [dwfs, dbfs, d["wvf"], d["wvv"], d["wvs"], d["wvc"], d["bv"],
               d["wr"], d["br"]])
    for ref, val in zip(d_refs, flat):
        acc(ref, val)


# --------------------------------------------------------------- packing

def supports(params, use_viewdirs: bool, num_semantic: int, depth: int,
             width: int, S: int, multires: int, multires_views: int) -> bool:
    if not use_viewdirs or num_semantic > 0 or depth > 4 or depth < 1:
        return False
    if S != -1 and (S <= 0 or _TILE % S != 0):
        return False  # S=-1: defer the sample-count check to apply time
    p = params["params"] if "params" in params else params
    if "semantic_0" in p:
        return False
    if p["trunk_0"]["kernel"].shape[0] != 3 + 6 * multires:
        return False
    if p["views_0"]["kernel"].shape[0] != width + 3 + 6 * multires_views:
        return False
    return p["trunk_0"]["kernel"].shape[1] == width and width in (128, 256)


def _pack(params, spec: _Spec):
    p = params["params"] if "params" in params else params
    dt = spec.dtype
    W = spec.width

    w1 = p["trunk_0"]["kernel"].astype(dt)  # [63, W] flax order
    w1k = w1[spec.perm_p.argsort()]  # -> kernel order [x|sin|cos]
    # NOTE: perm_p maps flax->kernel positions, so scatter = take(argsort).
    n3 = 3 * spec.n_freq_p
    w1x = jnp.pad(w1k[:3], ((0, 1), (0, 0)))
    w1s = w1k[3:3 + n3]
    w1c = w1k[3 + n3:]
    b1 = p["trunk_0"]["bias"].astype(jnp.float32)[None]

    tw = [p[f"trunk_{i}"]["kernel"].astype(dt) for i in range(1, spec.depth)]
    tb = [p[f"trunk_{i}"]["bias"].astype(jnp.float32)[None]
          for i in range(1, spec.depth)]

    wfs = jnp.zeros((W, W + _OUT), dt)
    wfs = wfs.at[:, :W].set(p["feature"]["kernel"].astype(dt))
    wfs = wfs.at[:, W + 3:W + 4].set(p["sigma"]["kernel"].astype(dt))
    bfs = jnp.zeros((1, W + _OUT), jnp.float32)
    bfs = bfs.at[0, :W].set(p["feature"]["bias"].astype(jnp.float32))
    bfs = bfs.at[0, W + 3].set(p["sigma"]["bias"].astype(jnp.float32)[0])

    wv = p["views_0"]["kernel"].astype(dt)  # [W + 27, W/2] flax order
    wvf = wv[:W]
    wv_enc = wv[W:][spec.perm_v.argsort()]
    n3v = 3 * spec.n_freq_v
    wvv = jnp.pad(wv_enc[:3], ((0, 1), (0, 0)))
    wvs = wv_enc[3:3 + n3v]
    wvc = wv_enc[3 + n3v:]
    bv = p["views_0"]["bias"].astype(jnp.float32)[None]

    wr = jnp.pad(p["rgb"]["kernel"].astype(dt), ((0, 0), (0, _OUT - 3)))
    br = jnp.zeros((1, _OUT), jnp.float32).at[0, :3].set(
        p["rgb"]["bias"].astype(jnp.float32))
    return [w1x, w1s, w1c, b1, *tw, *tb, wfs, bfs, wvf, wvv, wvs, wvc, bv,
            wr, br]


def _unpack_grads(dws, params, spec: _Spec):
    p = params["params"] if "params" in params else params
    depth, W = spec.depth, spec.width
    (dw1x, dw1s, dw1c, db1) = dws[:4]
    dtw = dws[4:4 + depth - 1]
    dtb = dws[4 + depth - 1:4 + 2 * (depth - 1)]
    (dwfs, dbfs, dwvf, dwvv, dwvs, dwvc, dbv, dwr, dbr) = dws[
        4 + 2 * (depth - 1):]
    dwfs_f, dwfs_s = dwfs[:, :W], dwfs[:, W:]
    dbfs_f, dbfs_s = dbfs[:, :W], dbfs[:, W:]

    def cast_like(val, ref):
        return val.astype(ref.dtype)

    out = {}
    w1_kernel_order = jnp.concatenate([dw1x[:3], dw1s, dw1c], axis=0)
    out["trunk_0"] = {
        "kernel": cast_like(w1_kernel_order[spec.perm_p],
                            p["trunk_0"]["kernel"]),
        "bias": cast_like(db1[0], p["trunk_0"]["bias"]),
    }
    for i in range(1, depth):
        out[f"trunk_{i}"] = {
            "kernel": cast_like(dtw[i - 1], p[f"trunk_{i}"]["kernel"]),
            "bias": cast_like(dtb[i - 1][0], p[f"trunk_{i}"]["bias"]),
        }
    out["feature"] = {"kernel": cast_like(dwfs_f, p["feature"]["kernel"]),
                      "bias": cast_like(dbfs_f[0], p["feature"]["bias"])}
    out["sigma"] = {"kernel": cast_like(dwfs_s[:, 3:4], p["sigma"]["kernel"]),
                    "bias": cast_like(dbfs_s[0, 3:4], p["sigma"]["bias"])}
    v_kernel_order = jnp.concatenate([dwvv[:3], dwvs, dwvc], axis=0)
    out["views_0"] = {
        "kernel": cast_like(
            jnp.concatenate([dwvf, v_kernel_order[spec.perm_v]], axis=0),
            p["views_0"]["kernel"]),
        "bias": cast_like(dbv[0], p["views_0"]["bias"]),
    }
    out["rgb"] = {"kernel": cast_like(dwr[:, :3], p["rgb"]["kernel"]),
                  "bias": cast_like(dbr[0, :3], p["rgb"]["bias"])}
    return {"params": out} if "params" in params else out


# ------------------------------------------------------------ pallas calls

def _full_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _call_fwd(spec: _Spec, pts, views, ws):
    P = pts.shape[0]
    grid = P // _TILE
    return pl.pallas_call(
        functools.partial(_fwd_kernel, spec),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.R, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[_full_spec(w.shape) for w in ws],
        ],
        out_specs=pl.BlockSpec((_TILE, _OUT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, _OUT), jnp.float32),
    )(pts, views, *ws)


def _call_bwd(spec: _Spec, pts, views, g, ws):
    P = pts.shape[0]
    grid = P // _TILE
    d_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, spec),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.R, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, _OUT), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[_full_spec(w.shape) for w in ws],
        ],
        out_specs=tuple(_full_spec(w.shape) for w in ws),
        out_shape=tuple(d_shapes),
    )(pts, views, g, *ws)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_raw(params, pts, views, spec):
    ws = _pack(params, spec)
    return _call_fwd(spec, pts, views, ws)


def _fused_raw_fwd(params, pts, views, spec):
    return _fused_raw(params, pts, views, spec), (params, pts, views)


def _fused_raw_bwd(spec, res, g):
    params, pts, views = res
    ws = _pack(params, spec)
    dws = _call_bwd(spec, pts, views, g, ws)
    d_params = _unpack_grads(list(dws), params, spec)
    return d_params, jnp.zeros_like(pts), jnp.zeros_like(views)


_fused_raw.defvjp(_fused_raw_fwd, _fused_raw_bwd)

_SPEC_CACHE = {}


def fused_nerf_apply_raw(params, pts, viewdirs, *, depth, width, multires,
                         multires_views, dtype=jnp.bfloat16):
    """Raw-input fast path: ``pts [N, S, 3]``, unit ``viewdirs [N, 3]`` ->
    raw ``[N, S, 4]`` (encoding + MLP fully in-kernel)."""
    N, S, _ = pts.shape
    key = (depth, width, S, multires, multires_views, str(dtype))
    if key not in _SPEC_CACHE:
        _SPEC_CACHE[key] = _Spec(depth, width, S, multires, multires_views,
                                 dtype)
    spec = _SPEC_CACHE[key]

    rays_per_tile = _TILE // S
    n_pad = (-N) % rays_per_tile
    pts4 = jnp.pad(pts.astype(jnp.float32), ((0, n_pad), (0, 0), (0, 1)))
    views4 = jnp.pad(viewdirs.astype(jnp.float32), ((0, n_pad), (0, 1)))
    P = (N + n_pad) * S

    raw = _fused_raw(params, pts4.reshape(P, 4), views4, spec)
    return raw.reshape(N + n_pad, S, _OUT)[:N, :, :4]
