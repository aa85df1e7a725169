"""Fused NeRF-MLP Pallas kernel v4: transposed inputs, in-kernel encoding.

The v3 packed-input kernel (ops/fused_mlp.py) still pays ~25ms/step of XLA
glue materializing the packed [P, 128] encoding. v4 eliminates ALL large
intermediates: the kernel reads raw positions as ``[4, P]`` float32 (points
on the LANE axis — no (8,128)-tiling waste) and per-ray view directions as
``[4, R]``, and computes the frequency encoding on-chip:

- **Exact phases via a hi/lo bfloat16 split.** The octave spread
  ``xf = F^T x`` has ONE power-of-two entry per output, so splitting
  ``x = hi + lo`` into two bfloat16 matmul passes reproduces the f32 product
  exactly (a power-of-two multiply is exact in bf16; the f32 accumulator adds
  the halves) — no HIGHEST-precision 6-pass matmul needed.
- **No transposes, no reshapes.** Every transposed operand is consumed with
  ``dot_general`` contracting dimension 0; per-ray view activations expand to
  points through an explicit 0/1 expansion matmul ``E`` (Mosaic's
  broadcast+reshape miscompiles — PERF.md).
- **Flax layout preserved.** First-layer/view weights are consumed as three
  row blocks (x / sin / cos) selected by a fixed permutation applied host-side
  to the (tiny) weight matrices; sigma rides the feature matmul.
- **Recompute backward** as in v2/v3: no saved activations, f32 weight-grad
  accumulation across the sequential grid, zero input cotangents.

Same supported topology as v3; the dispatcher (`train/state.FusedMLP`) picks
v4 when `DLNERF_FUSED_V4=1` or cfg requests it, else v3.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from depth_lidar_nerf_tpu.ops.fused_mlp import (  # noqa: F401
    _OUT, _TILE, interpret_mode, supports)

# Sample-block granularity of backward culling: tiles are
# (_TILE/_SAMPLE_BLOCK rays) x (_SAMPLE_BLOCK samples); smaller blocks cull
# tighter suffixes but need more grid steps.
_SAMPLE_BLOCK = int(os.environ.get("DLNERF_CULL_SAMPLE_BLOCK", 16))

# Mosaic's default 16MB scoped-vmem cap rejects tiles > 2048 points in the
# recompute backward; v5e has far more physical VMEM, so raise it.
_VMEM_LIMIT = int(os.environ.get("DLNERF_FUSED_VMEM_MB", 100)) * 1024 * 1024

# Forward-pass tile cap (points per grid step). The forward prefers larger
# tiles than the backward (see _fwd_impl); actual size via _fwd_tile_size.
_TILE_FWD = int(os.environ.get("DLNERF_FUSED_TILE_FWD", 8192))


def cull_fwd_enabled() -> bool:
    """Forward transmittance culling (see _fwd_impl_cf) — DLNERF_CULL_FWD=1
    to enable.

    Measured verdict (one v5e, flagship bench): OFF by default. The path is
    exact and fully tested, but the fine pass can only skip ~15-20% of its
    sample blocks (inverse-CDF importance sampling places fine samples
    proportional to weight mass, so few land post-termination — the same
    structural cap PERF.md documents for the backward cull), which does not
    pay for its machinery: 2048-point blocks instead of the 8192-point dense
    forward tile (-5k rays/s), plus the per-block transmittance tracking
    (log-sum matmul + predicated bodies) and the sort/unsort gathers
    (-15k rays/s) against ~+5k from the skips. Net 305k -> 285k rays/s, so
    the dense forward + cotangent-culled backward remains the default.
    """
    return os.environ.get("DLNERF_CULL_FWD", "0") == "1"


def _cparams():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


# relu placement: cast-then-max halves the VPU pass's bit width (relu(x) in
# bf16 equals bf16(relu(x)) exactly — the cast is monotone and preserves 0).
# Measured 389.8k vs 384.7k baseline (within the ~+-3k run noise band,
# kept as the cheaper form); DLNERF_RELU_BF16=0 restores max-then-cast.
_RELU_BF16 = os.environ.get("DLNERF_RELU_BF16", "1") == "1"


def _relu_cast(acc, dtype):
    if _RELU_BF16 and dtype == jnp.bfloat16:
        return jnp.maximum(acc.astype(dtype), jnp.asarray(0.0, dtype))
    return jnp.maximum(acc, 0.0).astype(dtype)


def _mask_cast(gate, val, dtype):
    """where(gate, val, 0) cast to dtype.

    Selecting after the cast (the _relu_cast trick) measured 5k rays/s
    SLOWER here — the mixed-width select (f32 gate, bf16 value) costs more
    than the narrower pass saves — so the backward keeps select-then-cast."""
    return jnp.where(gate, val, 0.0).astype(dtype)


def _dot_c0(a, b):
    """Contract dim 0 of both: [K, M] x [K, N] -> [M, N]."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_b_t(a, b):  # a @ b^T
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _enc_perm(n_freq: int) -> np.ndarray:
    """kernel_row = perm[flax_row] for the [x | sin | cos] block layout."""
    perm = np.zeros(3 + 6 * n_freq, np.int64)
    perm[:3] = np.arange(3)
    for f in range(n_freq):
        for d in range(3):
            perm[3 + 6 * f + d] = 3 + 3 * f + d
            perm[6 + 6 * f + d] = 3 + 3 * n_freq + 3 * f + d
    return perm


def _freq_spread(n_freq: int):
    """In-kernel [3, 3n] octave matrix: F[d, 3f+d] = 2^f."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (3, 3 * n_freq), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (3, 3 * n_freq), 1)
    octave = jnp.exp((cols // 3).astype(jnp.float32) * jnp.float32(np.log(2.0)))
    return jnp.where(rows == cols % 3, octave, 0.0)


_ENC_RECUR = os.environ.get("DLNERF_ENC_RECURRENCE", "1") == "1"


def _encode_t(xt, n_freq, dtype):
    """xt [3, M] f32 -> stacked encoding [3 + 6n, M] (x | sin | cos rows).

    Phases are exact: hi/lo bf16 split + power-of-two octave matmul. One
    stacked output feeds ONE first-layer matmul (three split matmuls each
    paid an MXU pipeline fill for a tiny K).

    For bf16 kernels the sin/cos of the octave ladder come from the
    double-angle recurrence (sin 2a = 2 sin a cos a, cos 2a = 1 - 2 sin^2 a):
    2 transcendentals + 3(n-1) FMA rows instead of 2*3n transcendentals. The
    f32 recurrence error (~2^n ulps, ~1e-4 absolute by octave 9) is below
    the bf16 RELATIVE quantum for typical magnitudes, but near zero
    crossings of high octaves (|sin| ~ 1e-3) it can exceed bf16 resolution
    — so stored encodings are within parity tolerance of the direct path,
    not bit-identical (measured vs f64: recurrence 7.81e-3 max error, direct
    f32 8.21e-3, both dominated by the bf16 cast). f32 kernels keep the
    exact direct path.
    """
    hi = xt.astype(dtype)
    if _ENC_RECUR and dtype == jnp.bfloat16:
        s, c = jnp.sin(xt), jnp.cos(xt)  # [3, M] f32, octave 0
        sins, coss = [s], [c]
        for _ in range(1, n_freq):
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
            sins.append(s)
            coss.append(c)
        return jnp.concatenate(
            [hi] + [v.astype(dtype) for v in sins]
            + [v.astype(dtype) for v in coss], axis=0)
    F = _freq_spread(n_freq).astype(dtype)  # entries are 0 or 2^f (exact)
    lo = (xt - hi.astype(jnp.float32)).astype(dtype)
    xf = _dot_c0(F, hi) + _dot_c0(F, lo)  # [3n, M] f32, exact phases
    return jnp.concatenate(
        [hi, jnp.sin(xf).astype(dtype), jnp.cos(xf).astype(dtype)], axis=0)


def _expand_matrix(R, S, dtype):
    """[T, R]: E[t, r] = 1 iff t // S == r (per-ray -> per-point)."""
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (R * S, R), 0)
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (R * S, R), 1)
    return ((t_idx // S) == r_idx).astype(dtype)


def _live_skips(depth, skips):
    """Skip layers whose concat is consumed by a TRUNK layer (reference
    run_nerf_helpers.py:101-105: concat after layer s feeds layer s+1, so a
    skip is live iff s < depth - 1; netdepth=4 with skips=(4,) has none)."""
    return tuple(sorted(s for s in (skips or ()) if 0 <= s < depth - 1))


def _unflatten(flat, depth, skips=()):
    ls = _live_skips(depth, skips)
    (w1, b1) = flat[:2]
    tw = list(flat[2:2 + depth - 1])
    tb = list(flat[2 + depth - 1:2 + 2 * (depth - 1)])
    o = 2 + 2 * (depth - 1)
    sw = dict(zip(ls, flat[o:o + len(ls)]))
    (wfs, bfs, wsig, wvf, wve, bv, wr, br) = flat[o + len(ls):]
    return (w1, b1, tw, tb, sw, wfs, bfs, wsig, wvf, wve, bv, wr, br)


def _n_ws(depth, skips=()):
    return 2 + 2 * (depth - 1) + len(_live_skips(depth, skips)) + 8


def _forward_tile(spec, xt, vt, ws):
    """One tile of the fused forward.

    The positional/view encodings feed ONE stacked first-layer matmul each
    (the previous x/sin/cos split paid three MXU pipeline fills for tiny-K
    operands). Accumulators stay f32 — Mosaic's tpu.matmul requires a 32-bit
    acc — with one relu+cast VPU pass per layer.
    """
    depth, dtype, S, R = spec[:4]
    (w1, b1, tw, tb, sw, wfs, bfs, wsig, wvf, wve, bv, wr, br) = ws
    W = wfs.shape[0]

    relu = _relu_cast
    enc_x = _encode_t(xt, (w1.shape[0] - 3) // 6, dtype)  # [3 + 6n_p, T]
    h = relu(_dot_c0(enc_x, w1) + b1, dtype)
    acts = [h]
    for i in range(depth - 1):
        acc = _dot(h, tw[i]) + tb[i]
        if i in sw:
            # Skip concat [x, h] (run_nerf_helpers.py:105) as a second
            # matmul on the encoding rows — no concat tile needed.
            acc = acc + _dot_c0(enc_x, sw[i])
        h = relu(acc, dtype)
        acts.append(h)

    feat = (_dot(h, wfs) + bfs).astype(dtype)  # [T, W]
    # transposed sigma head: [4, T] (row 3 = sigma)
    sigT = jax.lax.dot_general(wsig, h, (((0,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)

    enc_v = _encode_t(vt[:, :R], (wve.shape[0] - 3) // 6, dtype)
    hv_ray = _dot_c0(enc_v, wve).astype(dtype)  # [R, W/2]
    E = _expand_matrix(R, S, dtype)
    hv = relu(_dot(feat, wvf) + _dot(E, hv_ray) + bv, dtype)

    # transposed rgb head + bias: out [4, T] channel-major
    rgbT = jax.lax.dot_general(wr, hv, (((0,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    out = rgbT + sigT + br
    return out, (enc_x, acts, feat, hv, enc_v, E)


def _spec_skips(spec):
    return spec[4] if len(spec) > 4 else ()


def _fwd_kernel(spec, xt_ref, vt_ref, *refs):
    out_ref = refs[-1]
    ws = _unflatten([r[:] for r in refs[:-1]], spec[0], _spec_skips(spec))
    out, _ = _forward_tile(spec, xt_ref[:], vt_ref[:], ws)
    out_ref[:] = out


def _bwd_tile_body(spec, xt, vt, g, ws):
    """Recompute-forward + weight-grad math for one tile; returns the flat
    per-tile gradient list (same order as :func:`_pack_params`)."""
    depth, dtype, S, R = spec[:4]
    (w1, b1, tw, tb, sw, wfs, bfs, wsig, wvf, wve, bv, wr, br) = ws
    W = wfs.shape[0]

    g = g.astype(jnp.float32)
    _, (enc_x, acts, feat, hv, enc_v, E) = _forward_tile(spec, xt, vt, ws)

    gb = g.astype(dtype)  # [4, T]
    dwr = jax.lax.dot_general(hv, gb, (((0,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [128, 4]
    dbr = jnp.sum(g, 1, keepdims=True)  # [4, 1]

    dhv = jax.lax.dot_general(gb, wr, (((0,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [T, 128]
    dhv = _mask_cast(hv.astype(jnp.float32) > 0, dhv, dtype)
    dwvf = jax.lax.dot_general(feat, dhv, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dbv = jnp.sum(dhv.astype(jnp.float32), 0, keepdims=True)
    # per-ray reduction then contraction with the per-ray encodings
    dhv_ray = jax.lax.dot_general(E, dhv, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32
                                  ).astype(dtype)  # [R, W/2]
    dwve = _dot(enc_v, dhv_ray)  # [3 + 6n_v, W/2]

    dfeat = _dot_b_t(dhv, wvf).astype(dtype)
    h_last = acts[-1]
    dwfs = jax.lax.dot_general(h_last, dfeat, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # [W, W]
    dbfs = jnp.sum(dfeat.astype(jnp.float32), 0, keepdims=True)
    dwsig = jax.lax.dot_general(h_last, gb, (((0,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [W, 4]

    dh = _dot_b_t(dfeat, wfs) + jax.lax.dot_general(
        gb, wsig, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dtw = [None] * (depth - 1)
    dtb = [None] * (depth - 1)
    dsw = {}
    for li in range(depth - 1, 0, -1):
        dh = _mask_cast(acts[li].astype(jnp.float32) > 0, dh, dtype)
        dtw[li - 1] = jax.lax.dot_general(
            acts[li - 1], dh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dtb[li - 1] = jnp.sum(dh.astype(jnp.float32), 0, keepdims=True)
        if (li - 1) in sw:
            # The x half of the skip concat: grads to the encoding rows;
            # the encoding itself has no cotangent (inputs are nondiff).
            dsw[li - 1] = _dot(enc_x, dh)
        dh = _dot_b_t(dh, tw[li - 1])
    dh = _mask_cast(acts[0].astype(jnp.float32) > 0, dh, dtype)
    dw1 = _dot(enc_x, dh)  # [3 + 6n_p, W]
    db1 = jnp.sum(dh.astype(jnp.float32), 0, keepdims=True)

    return [dw1, db1, *dtw, *dtb, *[dsw[k] for k in sorted(dsw)],
            dwfs, dbfs, dwsig, dwvf, dwve, dbv, dwr, dbr]


def _bwd_kernel(spec, xt_ref, vt_ref, g_ref, *refs):
    depth, skips = spec[0], _spec_skips(spec)
    n_w = _n_ws(depth, skips)
    w_refs, d_refs = refs[:n_w], refs[n_w:]
    ws = _unflatten([r[:] for r in w_refs], depth, skips)
    flat = _bwd_tile_body(spec, xt_ref[:], vt_ref[:], g_ref[:], ws)

    i = pl.program_id(0)
    for ref, val in zip(d_refs, flat):
        @pl.when(i == 0)
        def _(ref=ref, val=val):
            ref[:] = val

        @pl.when(i != 0)
        def _(ref=ref, val=val):
            ref[:] = ref[:] + val


def _bwd_kernel_culled(spec, nSB, flags_ref, xt_ref, vt_ref, g_ref, *refs):
    """Backward with per-tile skipping: ``flags_ref`` (scalar-prefetched) is 1
    for tiles holding at least one live cotangent; dead tiles skip the whole
    recompute + grad body (exact — their contribution is identically zero)."""
    del nSB
    depth, skips = spec[0], _spec_skips(spec)
    n_w = _n_ws(depth, skips)
    w_refs, d_refs = refs[:n_w], refs[n_w:]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for r in d_refs:
            r[:] = jnp.zeros(r.shape, r.dtype)

    @pl.when(flags_ref[i] != 0)
    def _():
        ws = _unflatten([r[:] for r in w_refs], depth, skips)
        flat = _bwd_tile_body(spec, xt_ref[:], vt_ref[:], g_ref[:], ws)
        for ref, val in zip(d_refs, flat):
            ref[:] = ref[:] + val


# --------------------------------------------------------------- packing

def _pack_params(params, depth, n_p, n_v, dtype, skips=()):
    p = params["params"] if "params" in params else params
    W = p["trunk_0"]["kernel"].shape[1]
    ls = _live_skips(depth, skips)
    e_p = 3 + 6 * n_p

    # Kernel row order [x | sin | cos]: one stacked first-layer matmul.
    w1 = p["trunk_0"]["kernel"].astype(dtype)[_enc_perm(n_p).argsort()]
    b1 = p["trunk_0"]["bias"].astype(jnp.float32)[None]

    # trunk_{s+1} after a skip has kernel [e_p + W, W]: rows [:e_p] act on
    # the concat's x half (NeRFMLP concatenates [x, h]) and split off as a
    # separate row-permuted skip weight; rows [e_p:] stay the trunk matmul.
    tw, tb, sw = [], [], []
    for i in range(1, depth):
        k = p[f"trunk_{i}"]["kernel"].astype(dtype)
        if (i - 1) in ls:
            sw.append(k[:e_p][_enc_perm(n_p).argsort()])
            k = k[e_p:]
        tw.append(k)
        tb.append(p[f"trunk_{i}"]["bias"].astype(jnp.float32)[None])

    wfs = p["feature"]["kernel"].astype(dtype)  # [W, W]
    bfs = p["feature"]["bias"].astype(jnp.float32)[None]
    wsig = jnp.zeros((W, 4), dtype).at[:, 3:4].set(
        p["sigma"]["kernel"].astype(dtype))

    wv = p["views_0"]["kernel"].astype(dtype)
    wvf = wv[:W]
    wve = wv[W:][_enc_perm(n_v).argsort()]
    bv = p["views_0"]["bias"].astype(jnp.float32)[None]

    wr = jnp.pad(p["rgb"]["kernel"].astype(dtype), ((0, 0), (0, 1)))  # [128, 4]
    br = jnp.zeros((4, 1), jnp.float32)
    br = br.at[:3, 0].set(p["rgb"]["bias"].astype(jnp.float32))
    br = br.at[3, 0].set(p["sigma"]["bias"].astype(jnp.float32)[0])
    return [w1, b1, *tw, *tb, *sw, wfs, bfs, wsig, wvf, wve, bv, wr, br]


def _unpack_grads(dws, params, depth, n_p, n_v, skips=()):
    p = params["params"] if "params" in params else params
    ls = _live_skips(depth, skips)
    (dw1, db1) = dws[:2]
    dtw = dws[2:2 + depth - 1]
    dtb = dws[2 + depth - 1:2 + 2 * (depth - 1)]
    o = 2 + 2 * (depth - 1)
    dsw = dict(zip(ls, dws[o:o + len(ls)]))
    (dwfs, dbfs, dwsig, dwvf, dwve, dbv, dwr, dbr) = dws[o + len(ls):]
    W = p["trunk_0"]["kernel"].shape[1]

    def cl(val, ref):
        return val.astype(ref.dtype)

    out = {}
    out["trunk_0"] = {"kernel": cl(dw1[_enc_perm(n_p)],
                                   p["trunk_0"]["kernel"]),
                      "bias": cl(db1[0], p["trunk_0"]["bias"])}
    for i in range(1, depth):
        dk = dtw[i - 1]
        if (i - 1) in dsw:
            # Reassemble the Flax [e_p + W, W] skip-layer kernel grad:
            # encoding rows back in flax order on top, trunk rows below.
            dk = jnp.concatenate([dsw[i - 1][_enc_perm(n_p)], dk], axis=0)
        out[f"trunk_{i}"] = {
            "kernel": cl(dk, p[f"trunk_{i}"]["kernel"]),
            "bias": cl(dtb[i - 1][0], p[f"trunk_{i}"]["bias"])}
    out["feature"] = {"kernel": cl(dwfs, p["feature"]["kernel"]),
                      "bias": cl(dbfs[0], p["feature"]["bias"])}
    out["sigma"] = {"kernel": cl(dwsig[:, 3:4], p["sigma"]["kernel"]),
                    "bias": cl(dbr[3], p["sigma"]["bias"])}
    out["views_0"] = {
        "kernel": cl(jnp.concatenate([dwvf, dwve[_enc_perm(n_v)]], axis=0),
                     p["views_0"]["kernel"]),
        "bias": cl(dbv[0], p["views_0"]["bias"])}
    out["rgb"] = {"kernel": cl(dwr[:, :3], p["rgb"]["kernel"]),
                  "bias": cl(dbr[:3, 0], p["rgb"]["bias"])}
    return {"params": out} if "params" in params else out


def _full_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, *_: (0,) * nd,
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_t(params, xt, vt_f, vt_b, spec):
    return _fwd_impl(params, xt, vt_f, spec)


def _fwd_impl(params, xt, vt_f, spec):
    """Forward pallas_call on the (large) forward tile.

    The forward runs on ``tile_fwd`` (default 8192 points: fewer grid steps
    amortize the per-tile weight loads and encode overhead, measured ~10%
    faster than 2048) while both backwards keep the 2048-point tile that the
    recompute's VMEM footprint and the culling granularity want — hence the
    two viewdir layouts ``vt_f``/``vt_b``.
    """
    depth, dtype, S, tile_f, n_p, n_v = spec[:6]
    skips = spec[6] if len(spec) > 6 else ()
    ws = _pack_params(params, depth, n_p, n_v, dtype, skips)
    P = xt.shape[1]
    return pl.pallas_call(
        functools.partial(_fwd_kernel,
                          (depth, dtype, S, tile_f // S, skips)),
        grid=(P // tile_f,),
        in_specs=[
            pl.BlockSpec((3, tile_f), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
            *[_full_spec(w.shape) for w in ws],
        ],
        out_specs=pl.BlockSpec((4, tile_f), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, P), jnp.float32),
        compiler_params=_cparams(),
        interpret=interpret_mode(),
    )(xt, vt_f, *ws)


def _vjp_fwd(params, xt, vt_f, vt_b, spec):
    return _fwd_impl(params, xt, vt_f, spec), (params, xt, vt_b)


def _bwd_dense_dparams(params, xt, vt, g, depth, dtype, S, n_p, n_v,
                       skips=()):
    """Dense recompute backward: full-tile grid, returns the param grads."""
    ws = _pack_params(params, depth, n_p, n_v, dtype, skips)
    P = xt.shape[1]
    d_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
    dws = pl.pallas_call(
        functools.partial(_bwd_kernel, (depth, dtype, S, _TILE // S, skips)),
        grid=(P // _TILE,),
        in_specs=[
            pl.BlockSpec((3, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            *[_full_spec(w.shape) for w in ws],
        ],
        out_specs=tuple(_full_spec(w.shape) for w in ws),
        out_shape=tuple(d_shapes),
        compiler_params=_cparams(),
        interpret=interpret_mode(),
    )(xt, vt, g, *ws)
    return _unpack_grads(list(dws), params, depth, n_p, n_v, skips)


def _vjp_bwd(spec, res, g):
    # _fused_t spec layout: (depth, dtype, S, tile_f, n_p, n_v[, skips,
    # cull, sb]).
    if len(spec) > 7 and spec[7]:
        return _vjp_bwd_culled(spec, res, g)
    params, xt, vt = res
    depth, dtype, S, _tile_f, n_p, n_v = spec[:6]
    skips = spec[6] if len(spec) > 6 else ()
    P = xt.shape[1]
    d_params = _bwd_dense_dparams(params, xt, vt, g, depth, dtype, S, n_p,
                                  n_v, skips)
    return (d_params, jnp.zeros_like(xt),
            jnp.zeros((3, (P // _tile_f) * 128), xt.dtype),
            jnp.zeros_like(vt))


def _vjp_bwd_culled(spec, res, g):
    """Backward with exact transmittance culling.

    Weight gradients are order-invariant sums over points, so the rays can be
    permuted freely as long as (points, viewdirs, cotangents) move together —
    no un-permute pass exists. Rays are sorted by their live-cotangent length
    (``cull_eps``-masked compositing guarantees cotangents past each ray's
    termination are *exactly* zero), regrouped into (ray-block x sample-block)
    tiles, and every tile whose cotangents are all zero is skipped in-kernel
    via a scalar-prefetched flag. Equivalent of the reference CUDA hot path's
    missing early-termination (run_nerf.py:520-675 evaluates every sample).
    """
    params, xt, vt = res
    depth, dtype, S, _tile_f, n_p, n_v = spec[:6]
    skips = spec[6] if len(spec) > 6 else ()
    SB = spec[8]
    d_params = _bwd_culled_dparams(params, xt, vt, g, depth, dtype, S, n_p,
                                   n_v, SB, skips)
    return (d_params, jnp.zeros_like(xt),
            jnp.zeros((3, (xt.shape[1] // _tile_f) * 128), xt.dtype),
            jnp.zeros_like(vt))


def _bwd_culled_dparams(params, xt, vt, g, depth, dtype, S, n_p, n_v, SB,
                        skips=()):
    """Cotangent-culled recompute backward (see _vjp_bwd_culled docstring):
    returns the param grads for ray-major ``xt [3, P]`` / ``vt`` (_TILE
    viewdir layout) / ``g [4, P]``."""
    ws = _pack_params(params, depth, n_p, n_v, dtype, skips)
    P = xt.shape[1]
    N = P // S
    RB = _TILE // SB
    nSB = S // SB
    n_pad = (-N) % RB
    Nf = N + n_pad

    gch = g.reshape(4, N, S)
    vr = vt.reshape(3, -1, 128)[:, :, :_TILE // S].reshape(3, N)
    xch = xt.reshape(3, N, S)
    if n_pad:
        gch = jnp.pad(gch, ((0, 0), (0, n_pad), (0, 0)))
        vr = jnp.pad(vr, ((0, 0), (0, n_pad)))
        xch = jnp.pad(xch, ((0, 0), (0, n_pad), (0, 0)))

    # Per-ray live length = 1 + last sample with any nonzero cotangent.
    act = jnp.any(gch != 0.0, axis=0)  # [Nf, S]
    idx1 = jax.lax.broadcasted_iota(jnp.int32, (Nf, S), 1) + 1
    lengths = jnp.max(jnp.where(act, idx1, 0), axis=1)  # [Nf] in [0, S]
    order = jnp.argsort(lengths)
    lens_s = jnp.take(lengths, order)
    xs = jnp.take(xch, order, axis=1)
    gs = jnp.take(gch, order, axis=1)
    vs = jnp.take(vr, order, axis=1)

    nRB = Nf // RB
    xb = xs.reshape(3, nRB, RB, nSB, SB).transpose(0, 1, 3, 2, 4).reshape(3, -1)
    gb = gs.reshape(4, nRB, RB, nSB, SB).transpose(0, 1, 3, 2, 4).reshape(4, -1)
    vpad = jnp.pad(vs.reshape(3, nRB, RB),
                   ((0, 0), (0, 0), (0, 128 - RB))).reshape(3, -1)
    # Sorted ascending, so each ray block's max live length is its last entry.
    lmax = lens_s.reshape(nRB, RB)[:, -1]
    sb_start = jnp.arange(nSB, dtype=jnp.int32) * SB
    flags = (lmax[:, None] > sb_start[None, :]).astype(jnp.int32).reshape(-1)

    kspec = (depth, dtype, SB, RB, skips)
    d_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nRB * nSB,),
        in_specs=[
            pl.BlockSpec((3, _TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128), lambda i, *_: (0, i // nSB),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            *[_full_spec(w.shape) for w in ws],
        ],
        out_specs=tuple(_full_spec(w.shape) for w in ws),
    )
    dws = pl.pallas_call(
        functools.partial(_bwd_kernel_culled, kspec, nSB),
        grid_spec=grid_spec,
        out_shape=tuple(d_shapes),
        compiler_params=_cparams(),
        interpret=interpret_mode(),
    )(flags, xb, vpad, gb, *ws)
    return _unpack_grads(list(dws), params, depth, n_p, n_v, skips)


_fused_t.defvjp(_vjp_fwd, _vjp_bwd)


# ------------------------------------------------- saved-activation backward

# The recompute backward spends 1/3 of its FLOPs re-running the forward. On
# this chip the backward is MXU-bound with HBM bandwidth to spare, so for the
# FINE pass (where transmittance culling only reaches 15-20%) it is faster to
# write the activations to HBM in the forward and stream them back through the
# backward's double-buffered BlockSpecs: ~720 B/point of (mostly overlapped)
# DMA replaces 33% of the backward's matmul FLOPs. The coarse pass keeps the
# recompute+cull backward (its ~45-50% cull beats recompute removal).
_ACTS_TILE = int(os.environ.get("DLNERF_BWD_ACTS_TILE", 4096))
# The acts-writing forward prefers a larger tile than the acts-reading
# backward (8192/4096 measured 376.6k vs 374.1k at 4096/4096; 16384 blows the
# scoped-vmem stack). 0 = same as the backward tile.
_ACTS_TILE_FWD = int(os.environ.get("DLNERF_FWD_ACTS_TILE", 8192))


def bwd_acts_enabled() -> bool:
    return os.environ.get("DLNERF_BWD_ACTS", "1") == "1"


# HBM cap for saved activations (2816 B/point at width 256 / depth 4: five
# [W] bf16 trunk/feature arrays + one [W/2]): the default admits the 16k-ray
# fine pass (2.1M points, ~5.9GB) but keeps image-sized patch renders on the
# recompute path. The env var is expressed in depth-4/width-256 POINTS for
# continuity; deeper/wider topologies (e.g. the reference-default
# netdepth_fine=8, 4864 B/point) get a proportionally smaller point cap via
# :func:`acts_points_cap` so the BYTE budget is what's actually pinned.
_ACTS_MAX_POINTS = int(os.environ.get("DLNERF_BWD_ACTS_MAX_POINTS",
                                      4 * 1024 * 1024))


def _acts_bytes_per_point(depth: int, width: int, dtype=jnp.bfloat16) -> int:
    # HBM cost of the acts DUMP alone: the VMEM window formula minus the
    # [4] f32 raw row (which exists on every path, saved-acts or not).
    # Single source of truth for the layout: _acts_point_bytes.
    return _acts_point_bytes(depth, width, dtype) - 16


def acts_points_cap(depth: int, width: int, dtype=jnp.bfloat16) -> int:
    """Point cap for the saved-acts backward at this topology: the byte
    budget _ACTS_MAX_POINTS implies at its D=4/W=256 bf16 reference shape."""
    return (_ACTS_MAX_POINTS * 2816) // _acts_bytes_per_point(
        depth, width, dtype)


def _fwd_kernel_acts(spec, xt_ref, vt_ref, *refs):
    """Forward that also writes the per-point activations the backward needs:
    trunk layers, feature, and view-branch activations (encodings are
    recomputed in the backward — they are VPU-cheap and 4.5x the traffic)."""
    depth, skips = spec[0], _spec_skips(spec)
    n_w = _n_ws(depth, skips)
    w_refs, o_refs = refs[:n_w], refs[n_w:]
    ws = _unflatten([r[:] for r in w_refs], depth, skips)
    out, (enc_x, acts, feat, hv, _enc_v, _E) = _forward_tile(
        spec, xt_ref[:], vt_ref[:], ws)
    o_refs[0][:] = out
    for ref, a in zip(o_refs[1:], [*acts, feat, hv]):
        ref[:] = a


def _bwd_kernel_acts(spec, xt_ref, vt_ref, g_ref, *refs):
    """Backward consuming streamed activations: `_bwd_tile_body` minus the
    forward recompute.

    ``spec[4]`` (has_gfeat): an extra streamed input carries a cotangent of
    the *feature* activation — how the out-of-kernel semantic head
    (``run_nerf_helpers.py:109``: two Dense layers off ``feature``) routes
    its gradient into the trunk; see :func:`_fused_t_acts_sem`."""
    depth, dtype, S, R = spec[:4]
    has_gfeat = len(spec) > 4 and spec[4]
    skips = spec[5] if len(spec) > 5 else ()
    n_w = _n_ws(depth, skips)
    w_refs = refs[:n_w]
    a_refs = refs[n_w:n_w + depth + 2]
    rest = refs[n_w + depth + 2:]
    gfeat_ref = rest[0] if has_gfeat else None
    d_refs = rest[1:] if has_gfeat else rest
    ws = _unflatten([r[:] for r in w_refs], depth, skips)
    (w1, b1, tw, tb, sw, wfs, bfs, wsig, wvf, wve, bv, wr, br) = ws

    acts = [a_refs[i][:] for i in range(depth)]
    feat = a_refs[depth][:]
    hv = a_refs[depth + 1][:]
    enc_x = _encode_t(xt_ref[:], (w1.shape[0] - 3) // 6, dtype)
    enc_v = _encode_t(vt_ref[:, :R], (wve.shape[0] - 3) // 6, dtype)
    E = _expand_matrix(R, S, dtype)

    g = g_ref[:].astype(jnp.float32)
    gb = g.astype(dtype)
    dwr = jax.lax.dot_general(hv, gb, (((0,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dbr = jnp.sum(g, 1, keepdims=True)

    dhv = jax.lax.dot_general(gb, wr, (((0,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dhv = _mask_cast(hv.astype(jnp.float32) > 0, dhv, dtype)
    dwvf = jax.lax.dot_general(feat, dhv, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dbv = jnp.sum(dhv.astype(jnp.float32), 0, keepdims=True)
    dhv_ray = jax.lax.dot_general(E, dhv, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32
                                  ).astype(dtype)
    dwve = _dot(enc_v, dhv_ray)

    dfeat_f32 = _dot_b_t(dhv, wvf)
    if has_gfeat:
        dfeat_f32 = dfeat_f32 + gfeat_ref[:].astype(jnp.float32)
    dfeat = dfeat_f32.astype(dtype)
    h_last = acts[-1]
    dwfs = jax.lax.dot_general(h_last, dfeat, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dbfs = jnp.sum(dfeat.astype(jnp.float32), 0, keepdims=True)
    dwsig = jax.lax.dot_general(h_last, gb, (((0,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)

    dh = _dot_b_t(dfeat, wfs) + jax.lax.dot_general(
        gb, wsig, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dtw = [None] * (depth - 1)
    dtb = [None] * (depth - 1)
    dsw = {}
    for li in range(depth - 1, 0, -1):
        dh = _mask_cast(acts[li].astype(jnp.float32) > 0, dh, dtype)
        dtw[li - 1] = jax.lax.dot_general(
            acts[li - 1], dh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dtb[li - 1] = jnp.sum(dh.astype(jnp.float32), 0, keepdims=True)
        if (li - 1) in sw:
            dsw[li - 1] = _dot(enc_x, dh)
        dh = _dot_b_t(dh, tw[li - 1])
    dh = _mask_cast(acts[0].astype(jnp.float32) > 0, dh, dtype)
    dw1 = _dot(enc_x, dh)
    db1 = jnp.sum(dh.astype(jnp.float32), 0, keepdims=True)

    flat = [dw1, db1, *dtw, *dtb, *[dsw[k] for k in sorted(dsw)],
            dwfs, dbfs, dwsig, dwvf, dwve, dbv, dwr, dbr]
    i = pl.program_id(0)
    for ref, val in zip(d_refs, flat):
        @pl.when(i == 0)
        def _(ref=ref, val=val):
            ref[:] = val

        @pl.when(i != 0)
        def _(ref=ref, val=val):
            ref[:] = ref[:] + val


# Scoped-VMEM budget for the acts kernels' double-buffered point windows.
# v5e has 128MB of VMEM; 96 leaves headroom for weights + compute. At the
# D=4/W=256 shapes this never binds (the 8192/4096 tile caps rule); it only
# shrinks tiles for deep/f32 topologies (e.g. the reference-default
# netdepth_fine=8 in f32 needs 163MB at tile 8192 — measured OOM).
_ACTS_VMEM_MB = int(os.environ.get("DLNERF_ACTS_VMEM_MB", 96))


def _acts_point_bytes(depth: int, width: int, dtype) -> int:
    """Per-point bytes of acts-kernel windows: (depth+1) [W] + one [W/2]
    activation rows in the compute dtype, plus the [4] f32 raw row."""
    b = 2 if dtype == jnp.bfloat16 else 4
    return ((depth + 1) * width + width // 2) * b + 16


def _acts_vmem_cap(depth: int, width: int, dtype) -> int:
    return (_ACTS_VMEM_MB * 1024 * 1024
            ) // (2 * _acts_point_bytes(depth, width, dtype))


def _acts_tile(S: int, depth: int = 4, width: int = 256,
               dtype=jnp.bfloat16) -> int:
    """Backward tile for the saved-acts path: large (no recompute stack in
    VMEM), capped by the 128-ray viewdir block and the VMEM budget."""
    cap = min(_ACTS_TILE, 128 * S, _acts_vmem_cap(depth, width, dtype))
    return max(_TILE, (cap // _TILE) * _TILE)


def _acts_tile_fwd(S: int, depth: int = 4, width: int = 256,
                   dtype=jnp.bfloat16) -> int:
    if _ACTS_TILE_FWD <= 0:
        return _acts_tile(S, depth, width, dtype)
    cap = min(_ACTS_TILE_FWD, 128 * S, _acts_vmem_cap(depth, width, dtype))
    return max(_TILE, (cap // _TILE) * _TILE)


def _spec_wd(params, spec):
    """(depth, width, dtype) for the acts tile policy, from a spec + params."""
    p = params["params"] if "params" in params else params
    return spec[0], p["trunk_0"]["kernel"].shape[1], spec[1]


def _fwd_impl_acts(params, xt, vt_a, spec):
    """Forward returning (raw, activation arrays) on the saved-acts tile."""
    depth, dtype, S, tile_f, n_p, n_v = spec[:6]
    skips = spec[6] if len(spec) > 6 else ()
    tile = _acts_tile_fwd(S, *_spec_wd(params, spec))
    ws = _pack_params(params, depth, n_p, n_v, dtype, skips)
    P = xt.shape[1]
    W = ws[2].shape[1]  # any trunk layer's output width
    out_shapes = [jax.ShapeDtypeStruct((4, P), jnp.float32)]
    out_shapes += [jax.ShapeDtypeStruct((P, W), dtype)] * (depth + 1)
    out_shapes += [jax.ShapeDtypeStruct((P, W // 2), dtype)]
    out_specs = [pl.BlockSpec((4, tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
    out_specs += [pl.BlockSpec((tile, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * (depth + 1)
    out_specs += [pl.BlockSpec((tile, W // 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel_acts,
                          (depth, dtype, S, tile // S, skips)),
        grid=(P // tile,),
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
            *[_full_spec(w.shape) for w in ws],
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        compiler_params=_cparams(),
        interpret=interpret_mode(),
    )(xt, vt_a, *ws)
    return outs[0], tuple(outs[1:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_t_acts(params, xt, vt_a, vt_f, spec):
    # Primal-only calls (eval renders) never need activations: plain forward.
    return _fwd_impl(params, xt, vt_f, spec)


def _vjp_fwd_acts(params, xt, vt_a, vt_f, spec):
    out, acts = _fwd_impl_acts(params, xt, vt_a, spec)
    return out, (params, xt, vt_a, acts)


def _bwd_acts_dparams(params, xt, vt_a, acts, g, spec, gfeat=None):
    """Run the saved-acts backward kernel; returns the param grads."""
    depth, dtype, S, _tile_f, n_p, n_v = spec[:6]
    skips = spec[6] if len(spec) > 6 else ()
    wd = _spec_wd(params, spec)
    tile = _acts_tile(S, *wd)
    ws = _pack_params(params, depth, n_p, n_v, dtype, skips)
    P = xt.shape[1]
    W = ws[2].shape[1]
    if _acts_tile_fwd(S, *wd) != tile:
        # vt_a was laid out for the forward's tile; re-block for this one.
        Nf = P // S
        vr = vt_a.reshape(3, -1, 128)[:, :, :_acts_tile_fwd(S, *wd) // S]
        vt_a = _build_vt(vr.reshape(3, Nf), Nf, S, tile)
    d_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
    a_specs = [pl.BlockSpec((tile, W), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)] * (depth + 1)
    a_specs += [pl.BlockSpec((tile, W // 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    g_args, g_specs = (), ()
    if gfeat is not None:
        g_args = (gfeat,)
        g_specs = (pl.BlockSpec((tile, W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),)
    dws = pl.pallas_call(
        functools.partial(_bwd_kernel_acts,
                          (depth, dtype, S, tile // S, gfeat is not None,
                           skips)),
        grid=(P // tile,),
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            *[_full_spec(w.shape) for w in ws],
            *a_specs,
            *g_specs,
        ],
        out_specs=tuple(_full_spec(w.shape) for w in ws),
        out_shape=tuple(d_shapes),
        compiler_params=_cparams(),
        interpret=interpret_mode(),
    )(xt, vt_a, g, *ws, *acts, *g_args)
    return _unpack_grads(list(dws), params, depth, n_p, n_v, skips)


def _vjp_bwd_acts(spec, res, g):
    params, xt, vt_a, acts = res
    _tile_f = spec[3]
    P = xt.shape[1]
    d_params = _bwd_acts_dparams(params, xt, vt_a, acts, g, spec)
    return (d_params, jnp.zeros_like(xt), jnp.zeros_like(vt_a),
            jnp.zeros((3, (P // _tile_f) * 128), xt.dtype))


_fused_t_acts.defvjp(_vjp_fwd_acts, _vjp_bwd_acts)


# ------------------------- in-kernel semantic head + unweighted ray sum

def _pack_sem(params, dtype):
    p = params["params"] if "params" in params else params
    return [p["semantic_0"]["kernel"].astype(dtype),
            p["semantic_0"]["bias"].astype(jnp.float32)[None],
            p["semantic_1"]["kernel"].astype(dtype),
            p["semantic_1"]["bias"].astype(jnp.float32)[None]]


def _sem_ray_feature(feat, R, S, dtype):
    """feat [T, W] -> unweighted per-ray feature sum [R, W] in ``dtype``."""
    E = _expand_matrix(R, S, dtype)  # [T, R]
    return _dot_c0(E, feat).astype(dtype)


def _sem_head_tile(feat, sem_ws, R, S, dtype):
    """feat [T, W] -> ray-summed semantic logits [R, C].

    Head math mirrors NeRFMLP / the reference (two Dense layers, NO
    activation between, off the pre-view ``feature`` —
    run_nerf_helpers.py:107-111); the per-ray reduction is the reference's
    UNWEIGHTED sum over samples (run_nerf_helpers.py:589). Because the head
    is affine and the sum is unweighted, they commute:
    ``sum_s head(feat_s) == head(sum_s feat_s)`` with biases scaled by S —
    so the head matmuls run on [R, W] per-RAY feature sums instead of
    [T, W] per-point features (S = T/R fewer MXU passes for the head, and
    the [N, S, C] per-point logits tensor never exists at all).
    """
    ws0, bs0, ws1, bs1 = sem_ws
    fsum = _sem_ray_feature(feat, R, S, dtype)  # [R, W]
    s0r = (_dot(fsum, ws0) + float(S) * bs0).astype(dtype)  # [R, W/2]
    return _dot(s0r, ws1) + float(S) * bs1  # [R, C] f32


def _fwd_kernel_sem_only(spec, xt_ref, vt_ref, *refs):
    """Primal-only semantic forward: raw + ray-summed logits, WITHOUT the
    backward's activation dump (a no-grad patch/eval render would otherwise
    pay ~2.8KB/point of dead HBM writes)."""
    depth, dtype, S, R = spec[:4]
    skips = _spec_skips(spec)
    n_w = _n_ws(depth, skips)
    w_refs = refs[:n_w]
    sem_refs = refs[n_w:n_w + 4]
    raw_ref, sem_ref = refs[n_w + 4:]
    ws = _unflatten([r[:] for r in w_refs], depth, skips)
    out, (_enc, _acts, feat, _hv, _ev, _E) = _forward_tile(
        spec, xt_ref[:], vt_ref[:], ws)
    raw_ref[:] = out
    sem_ref[:] = _sem_head_tile(feat, [r[:] for r in sem_refs], R, S, dtype)


def _fwd_kernel_acts_sem(spec, xt_ref, vt_ref, *refs):
    """Acts-dump forward + in-kernel semantic head."""
    depth, dtype, S, R = spec[:4]
    skips = _spec_skips(spec)
    n_w = _n_ws(depth, skips)
    w_refs = refs[:n_w]
    sem_refs = refs[n_w:n_w + 4]
    o_refs = refs[n_w + 4:]
    ws = _unflatten([r[:] for r in w_refs], depth, skips)
    out, (_enc, acts, feat, hv, _ev, _E) = _forward_tile(
        spec, xt_ref[:], vt_ref[:], ws)
    o_refs[0][:] = out
    for ref, a in zip(o_refs[1:depth + 3], [*acts, feat, hv]):
        ref[:] = a
    o_refs[depth + 3][:] = _sem_head_tile(feat, [r[:] for r in sem_refs],
                                          R, S, dtype)


def _bwd_kernel_acts_sem(spec, xt_ref, vt_ref, g_ref, gsem_ref, *refs):
    """Saved-acts backward incl. the semantic head: the per-RAY semantic
    cotangent [R, C] expands to points through the 0/1 matrix (the transpose
    of the in-kernel ray sum), the head grads accumulate like every other
    weight, and the head's feature-cotangent re-enters the trunk — all
    in-kernel, so no [P, W] f32 feature cotangent ever touches HBM (the
    round-2 out-of-kernel head paid ~2KB/point for that round-trip)."""
    depth, dtype, S, R = spec[:4]
    skips = _spec_skips(spec)
    n_w = _n_ws(depth, skips)
    w_refs = refs[:n_w]
    sem_refs = refs[n_w:n_w + 4]
    a_refs = refs[n_w + 4:n_w + 4 + depth + 2]
    d_refs = refs[n_w + 4 + depth + 2:]
    ws = _unflatten([r[:] for r in w_refs], depth, skips)
    (w1, b1, tw, tb, sw, wfs, bfs, wsig, wvf, wve, bv, wr, br) = ws
    ws0, bs0, ws1, bs1 = [r[:] for r in sem_refs]

    acts = [a_refs[i][:] for i in range(depth)]
    feat = a_refs[depth][:]
    hv = a_refs[depth + 1][:]
    enc_x = _encode_t(xt_ref[:], (w1.shape[0] - 3) // 6, dtype)
    enc_v = _encode_t(vt_ref[:, :R], (wve.shape[0] - 3) // 6, dtype)
    E = _expand_matrix(R, S, dtype)

    g = g_ref[:].astype(jnp.float32)
    gb = g.astype(dtype)
    dwr = jax.lax.dot_general(hv, gb, (((0,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dbr = jnp.sum(g, 1, keepdims=True)

    dhv = jax.lax.dot_general(gb, wr, (((0,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dhv = _mask_cast(hv.astype(jnp.float32) > 0, dhv, dtype)
    dwvf = jax.lax.dot_general(feat, dhv, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dbv = jnp.sum(dhv.astype(jnp.float32), 0, keepdims=True)
    dhv_ray = jax.lax.dot_general(E, dhv, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32
                                  ).astype(dtype)
    dwve = _dot(enc_v, dhv_ray)

    # Semantic head backward — exact adjoint of the affine-head-on-ray-sum
    # forward (_sem_head_tile): all head matmuls run on per-RAY [R, *]
    # operands; only the feature ray-sum and the final cotangent expansion
    # touch per-point [T, W] tensors.
    gsem_r = gsem_ref[:].astype(jnp.float32)  # [R, C]
    gsem_rb = gsem_r.astype(dtype)
    fsum = _sem_ray_feature(feat, R, S, dtype)  # [R, W] (recompute)
    s0r = (_dot(fsum, ws0) + float(S) * bs0).astype(dtype)  # [R, W/2]
    dws1 = _dot_c0(s0r, gsem_rb)  # [W/2, C]
    dbs1 = float(S) * jnp.sum(gsem_r, 0, keepdims=True)
    ds0r = _dot_b_t(gsem_rb, ws1)  # [R, W/2] f32 (no activation between)
    ds0r_b = ds0r.astype(dtype)
    dws0 = _dot_c0(fsum, ds0r_b)  # [W, W/2]
    dbs0 = float(S) * jnp.sum(ds0r, 0, keepdims=True)
    dfeat_ray = _dot_b_t(ds0r_b, ws0).astype(dtype)  # [R, W]
    E_sem = _expand_matrix(R, S, dtype)  # [T, R]
    dfeat_sem = _dot(E_sem, dfeat_ray)  # [T, W] f32

    dfeat_f32 = _dot_b_t(dhv, wvf) + dfeat_sem
    dfeat = dfeat_f32.astype(dtype)
    h_last = acts[-1]
    dwfs = jax.lax.dot_general(h_last, dfeat, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dbfs = jnp.sum(dfeat.astype(jnp.float32), 0, keepdims=True)
    dwsig = jax.lax.dot_general(h_last, gb, (((0,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)

    dh = _dot_b_t(dfeat, wfs) + jax.lax.dot_general(
        gb, wsig, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dtw = [None] * (depth - 1)
    dtb = [None] * (depth - 1)
    dsw = {}
    for li in range(depth - 1, 0, -1):
        dh = _mask_cast(acts[li].astype(jnp.float32) > 0, dh, dtype)
        dtw[li - 1] = jax.lax.dot_general(
            acts[li - 1], dh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dtb[li - 1] = jnp.sum(dh.astype(jnp.float32), 0, keepdims=True)
        if (li - 1) in sw:
            dsw[li - 1] = _dot(enc_x, dh)
        dh = _dot_b_t(dh, tw[li - 1])
    dh = _mask_cast(acts[0].astype(jnp.float32) > 0, dh, dtype)
    dw1 = _dot(enc_x, dh)
    db1 = jnp.sum(dh.astype(jnp.float32), 0, keepdims=True)

    flat = [dw1, db1, *dtw, *dtb, *[dsw[k] for k in sorted(dsw)],
            dwfs, dbfs, dwsig, dwvf, dwve, dbv, dwr,
            dbr, dws0, dbs0, dws1, dbs1]
    i = pl.program_id(0)
    for ref, val in zip(d_refs, flat):
        @pl.when(i == 0)
        def _(ref=ref, val=val):
            ref[:] = val

        @pl.when(i != 0)
        def _(ref=ref, val=val):
            ref[:] = ref[:] + val


def _fwd_impl_sem_only(params, xt, vt_f, spec):
    depth, dtype, S, tile_f, n_p, n_v, C = spec[:7]
    skips = spec[7] if len(spec) > 7 else ()
    R = tile_f // S
    ws = _pack_params(params, depth, n_p, n_v, dtype, skips)
    sem_ws = _pack_sem(params, dtype)
    P = xt.shape[1]
    raw, sem_ray = pl.pallas_call(
        functools.partial(_fwd_kernel_sem_only, (depth, dtype, S, R, skips)),
        grid=(P // tile_f,),
        in_specs=[
            pl.BlockSpec((3, tile_f), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
            *[_full_spec(w.shape) for w in ws],
            *[_full_spec(w.shape) for w in sem_ws],
        ],
        out_specs=(pl.BlockSpec((4, tile_f), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((R, C), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((4, P), jnp.float32),
                   jax.ShapeDtypeStruct((P // S, C), jnp.float32)),
        compiler_params=_cparams(),
        interpret=interpret_mode(),
    )(xt, vt_f, *ws, *sem_ws)
    return raw, sem_ray


def _fwd_impl_acts_sem(params, xt, vt_a, spec):
    depth, dtype, S, tile_f, n_p, n_v, C = spec[:7]
    skips = spec[7] if len(spec) > 7 else ()
    tile = _acts_tile_fwd(S, *_spec_wd(params, spec))
    R = tile // S
    ws = _pack_params(params, depth, n_p, n_v, dtype, skips)
    sem_ws = _pack_sem(params, dtype)
    P = xt.shape[1]
    W = ws[2].shape[1]
    out_shapes = [jax.ShapeDtypeStruct((4, P), jnp.float32)]
    out_shapes += [jax.ShapeDtypeStruct((P, W), dtype)] * (depth + 1)
    out_shapes += [jax.ShapeDtypeStruct((P, W // 2), dtype)]
    out_shapes += [jax.ShapeDtypeStruct((P // S, C), jnp.float32)]
    out_specs = [pl.BlockSpec((4, tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
    out_specs += [pl.BlockSpec((tile, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * (depth + 1)
    out_specs += [pl.BlockSpec((tile, W // 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
    out_specs += [pl.BlockSpec((R, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel_acts_sem, (depth, dtype, S, R, skips)),
        grid=(P // tile,),
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
            *[_full_spec(w.shape) for w in ws],
            *[_full_spec(w.shape) for w in sem_ws],
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        compiler_params=_cparams(),
        interpret=interpret_mode(),
    )(xt, vt_a, *ws, *sem_ws)
    return outs[0], tuple(outs[1:-1]), outs[-1]


def _bwd_acts_sem_dparams(params, xt, vt_a, acts, g, gsem, spec):
    depth, dtype, S, _tile_f, n_p, n_v, C = spec[:7]
    skips = spec[7] if len(spec) > 7 else ()
    wd = _spec_wd(params, spec)
    tile = _acts_tile(S, *wd)
    R = tile // S
    ws = _pack_params(params, depth, n_p, n_v, dtype, skips)
    sem_ws = _pack_sem(params, dtype)
    P = xt.shape[1]
    W = ws[2].shape[1]
    if _acts_tile_fwd(S, *wd) != tile:
        Nf = P // S
        vr = vt_a.reshape(3, -1, 128)[:, :, :_acts_tile_fwd(S, *wd) // S]
        vt_a = _build_vt(vr.reshape(3, Nf), Nf, S, tile)
    d_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                for w in (*ws, *sem_ws)]
    a_specs = [pl.BlockSpec((tile, W), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)] * (depth + 1)
    a_specs += [pl.BlockSpec((tile, W // 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    dws = pl.pallas_call(
        functools.partial(_bwd_kernel_acts_sem, (depth, dtype, S, R, skips)),
        grid=(P // tile,),
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[_full_spec(w.shape) for w in ws],
            *[_full_spec(w.shape) for w in sem_ws],
            *a_specs,
        ],
        out_specs=tuple(_full_spec(s.shape) for s in d_shapes),
        out_shape=tuple(d_shapes),
        compiler_params=_cparams(),
        interpret=interpret_mode(),
    )(xt, vt_a, g, gsem, *ws, *sem_ws, *acts)
    dws = list(dws)
    d_params = _unpack_grads(dws[:-4], params, depth, n_p, n_v, skips)
    p = params["params"] if "params" in params else params
    d = d_params["params"] if "params" in d_params else d_params
    dws0, dbs0, dws1, dbs1 = dws[-4:]
    d["semantic_0"] = {
        "kernel": dws0.astype(p["semantic_0"]["kernel"].dtype),
        "bias": dbs0[0].astype(p["semantic_0"]["bias"].dtype)}
    d["semantic_1"] = {
        "kernel": dws1.astype(p["semantic_1"]["kernel"].dtype),
        "bias": dbs1[0].astype(p["semantic_1"]["bias"].dtype)}
    return d_params


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_t_sem(params, xt, vt_a, vt_f, spec):
    """Semantic variant of _fused_t_acts: returns (raw [4, P], ray-summed
    semantic logits [P/S, C]). Primal-only calls (eval renders) use the
    no-acts forward; under grad the acts forward + in-kernel-head backward
    run (see _bwd_kernel_acts_sem)."""
    return _fwd_impl_sem_only(params, xt, vt_f, spec)


def _vjp_fwd_sem(params, xt, vt_a, vt_f, spec):
    raw, acts, sem_ray = _fwd_impl_acts_sem(params, xt, vt_a, spec)
    return (raw, sem_ray), (params, xt, vt_a, acts)


def _vjp_bwd_sem(spec, res, gs):
    graw, gsem = gs
    params, xt, vt_a, acts = res
    _tile_f = spec[3]
    P = xt.shape[1]
    d_params = _bwd_acts_sem_dparams(params, xt, vt_a, acts, graw, gsem, spec)
    return (d_params, jnp.zeros_like(xt), jnp.zeros_like(vt_a),
            jnp.zeros((3, (P // _tile_f) * 128), xt.dtype))


_fused_t_sem.defvjp(_vjp_fwd_sem, _vjp_bwd_sem)


# ----------------------------------------------- forward transmittance cull

def _fwd_kernel_cf(spec, xt_ref, vt_ref, aux_ref, *refs):
    """Forward with in-kernel early ray termination.

    Blocks of (RB rays x SB samples) run sample-sequentially per ray group; a
    VMEM scratch carries each ray's running transmittance (same alpha math as
    ``raw2outputs_t``, including the sigma noise, fed via ``aux``). Once every
    ray in the group has T below ``eps`` (= cull_eps/2: a safety margin over
    the compositor's hard-zero threshold, so float reassociation can never
    flip a live sample dead) the whole MLP block is skipped and a
    ``sigma=-1e10`` constant is written — the compositor zeroes those samples'
    weights either way, so outputs and gradients are exactly unchanged.
    """
    depth, dtype, SB, RB, nSB, eps = spec
    *w_refs, out_ref, t_scr = refs
    i = pl.program_id(0)
    sb = jax.lax.rem(i, nSB)

    @pl.when(sb == 0)
    def _():
        t_scr[...] = jnp.ones_like(t_scr)

    live = jnp.max(t_scr[0:1, :]) >= eps

    @pl.when(live)
    def _():
        ws = _unflatten([r[:] for r in w_refs], depth)
        out, _ = _forward_tile((depth, dtype, SB, RB), xt_ref[:], vt_ref[:],
                               ws)
        out_ref[:] = out
        # Transmittance factors of this block: prod over each ray's SB
        # samples of (1 - alpha + 1e-10), via a log-sum matmul with the
        # per-ray summing matrix E (Mosaic has no lane-windowed reduce).
        s = jnp.maximum(out[3:4, :] + aux_ref[1:2, :], 0.0) * aux_ref[0:1, :]
        logt = jnp.log(jnp.exp(-s) + 1e-10)  # [1, T]
        E = _expand_matrix(RB, SB, jnp.float32)  # [T, RB]
        t_scr[0:1, :] = t_scr[0:1, :] * jnp.exp(_dot(logt, E))

    @pl.when(jnp.logical_not(live))
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
        out_ref[:] = jnp.where(rows == 3, -1e10, 0.0)


def _fwd_impl_cf(params, xt, vr, aux, spec):
    """Culled forward: sort rays by estimated termination, regroup into
    (RB x SB) blocks (the backward-cull layout), run the sequential kernel,
    un-block and un-permute.

    ``xt [3, P]`` ray-major points, ``vr [3, Nf]`` per-ray unit viewdirs,
    ``aux = (key [Nf], deltas [Nf, S], noise [Nf, S])``: sort key (heuristic
    only — any permutation is exact), compositor's distance terms
    ``dists * |rays_d|``, and the exact sigma noise the compositor will add.
    """
    depth, dtype, S, n_p, n_v, SB, eps = spec
    key, deltas, noise = aux
    ws = _pack_params(params, depth, n_p, n_v, dtype)
    P = xt.shape[1]
    Nf = P // S
    RB = _TILE // SB
    nRB = Nf // RB
    nSB = S // SB

    order = jnp.argsort(key)
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(Nf, dtype=order.dtype))
    xs = jnp.take(xt.reshape(3, Nf, S), order, axis=1)
    ds = jnp.take(deltas, order, axis=0)
    ns = jnp.take(noise, order, axis=0)
    vs = jnp.take(vr, order, axis=1)

    xb = xs.reshape(3, nRB, RB, nSB, SB).transpose(0, 1, 3, 2, 4).reshape(3, -1)
    aux_b = jnp.stack([ds, ns]).reshape(2, nRB, RB, nSB, SB).transpose(
        0, 1, 3, 2, 4).reshape(2, -1)
    vt_cf = vs.reshape(3, nRB * RB)  # RB == 128: no lane pad needed

    # Skip at eps/2: a 2x margin over the compositor's hard-zero threshold,
    # so in-kernel float reassociation of the T product can never flip a
    # sample the compositor keeps (see _fwd_kernel_cf docstring).
    kspec = (depth, dtype, SB, RB, nSB, 0.5 * float(eps))
    out_b = pl.pallas_call(
        functools.partial(_fwd_kernel_cf, kspec),
        grid=(nRB * nSB,),
        in_specs=[
            pl.BlockSpec((3, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128), lambda i: (0, i // nSB),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            *[_full_spec(w.shape) for w in ws],
        ],
        out_specs=pl.BlockSpec((4, _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, P), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        compiler_params=_cparams(),
        interpret=interpret_mode(),
    )(xb, vt_cf, aux_b, *ws)
    out = out_b.reshape(4, nRB, nSB, RB, SB).transpose(0, 1, 3, 2, 4)
    return jnp.take(out.reshape(4, Nf, S), inv, axis=1).reshape(4, P)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_t_cf(params, xt, vr, vt_b, aux, spec):
    return _fwd_impl_cf(params, xt, vr, aux, spec)


def _vjp_fwd_cf(params, xt, vr, vt_b, aux, spec):
    return _fwd_impl_cf(params, xt, vr, aux, spec), (params, xt, vt_b)


def _vjp_bwd_cf(spec, res, g):
    params, xt, vt_b = res
    depth, dtype, S, n_p, n_v, SB, _eps = spec
    if spec_bwd_cull(spec):
        d_params = _bwd_culled_dparams(params, xt, vt_b, g, depth, dtype, S,
                                       n_p, n_v, SB)
    else:
        d_params = _bwd_dense_dparams(params, xt, vt_b, g, depth, dtype, S,
                                      n_p, n_v)
    Nf = xt.shape[1] // S
    zero_aux = (jnp.zeros((Nf,), jnp.float32),
                jnp.zeros((Nf, S), jnp.float32),
                jnp.zeros((Nf, S), jnp.float32))
    return (d_params, jnp.zeros_like(xt), jnp.zeros((3, Nf), xt.dtype),
            jnp.zeros_like(vt_b), zero_aux)


def spec_bwd_cull(spec) -> bool:
    """The cf path always pairs with the cotangent-culled backward (the same
    compositor contract actives both); kept as a hook for A/B runs."""
    return os.environ.get("DLNERF_CULL_BWD_CF", "1") == "1"


_fused_t_cf.defvjp(_vjp_fwd_cf, _vjp_bwd_cf)


def supports_rays_shape(S: int) -> bool:
    """Shape guard for the v4 per-ray entry point.

    ``S`` must tile ``_TILE`` evenly AND the resulting rays-per-tile
    ``_TILE // S`` must fit the [3, 128] per-tile viewdir block — with
    S < _TILE/128 (e.g. N_samples=8 at the default tile) the pad width in
    :func:`fused_nerf_apply_rays` goes negative and tracing crashes.
    """
    return S > 0 and _TILE % S == 0 and _TILE // S <= 128


def fused_nerf_apply_rays(params, rays_o, rays_d, viewdirs, z_vals, *, depth,
                          width, multires, multires_views,
                          dtype=jnp.bfloat16, cull_bwd=False, fwd_cull=None,
                          save_acts=False, mesh=None, ray_axis="rays",
                          skips=()):
    """v4 entry: rays [N, 3] + z [N, S] -> channel-major raw [4, N, S].

    Points are computed TRANSPOSED ([3, N, S]) so no [P, small]-lane tensor
    ever exists in HBM. With ``cull_bwd`` the backward pass skips tiles whose
    cotangents are all exactly zero (pair with ``cull_eps``-masked
    compositing; see :func:`_vjp_bwd_culled`). ``fwd_cull = (key, deltas,
    noise, eps)`` additionally runs the early-terminating forward
    (:func:`_fwd_impl_cf`): sort key [N], compositor distance terms [N, S],
    the exact sigma noise [N, S], and the compositor's cull_eps.

    With a multi-device ``mesh`` the call is shard_mapped over the ray axis:
    ``pallas_call`` is opaque to the GSPMD partitioner, so each device runs
    the kernel on its local ray shard (params replicated; the shard_map
    transpose psums the per-shard weight gradients over ICI). Requires
    ``N % mesh.size == 0`` — callers gate on :meth:`FusedMLP.rays_ok`.
    """
    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P_

        core = functools.partial(
            _apply_rays_core, depth=depth, width=width, multires=multires,
            multires_views=multires_views, dtype=dtype, cull_bwd=cull_bwd,
            fwd_eps=fwd_cull[3] if fwd_cull is not None else 0.0,
            save_acts=save_acts, skips=skips)
        if fwd_cull is None:
            aux_args, aux_specs = (), ()
        else:
            aux_args = tuple(fwd_cull[:3])
            aux_specs = (P_(ray_axis), P_(ray_axis), P_(ray_axis))
        return jax.shard_map(
            core, mesh=mesh,
            in_specs=(P_(), P_(ray_axis), P_(ray_axis), P_(ray_axis),
                      P_(ray_axis)) + aux_specs,
            out_specs=P_(None, ray_axis),
            check_vma=False,
        )(params, rays_o, rays_d, viewdirs, z_vals, *aux_args)
    if fwd_cull is None:
        return _apply_rays_core(params, rays_o, rays_d, viewdirs, z_vals,
                                depth=depth, width=width, multires=multires,
                                multires_views=multires_views, dtype=dtype,
                                cull_bwd=cull_bwd, save_acts=save_acts,
                                skips=skips)
    key, deltas, noise, eps = fwd_cull
    return _apply_rays_core(params, rays_o, rays_d, viewdirs, z_vals, key,
                            deltas, noise, depth=depth, width=width,
                            multires=multires, multires_views=multires_views,
                            dtype=dtype, cull_bwd=cull_bwd, fwd_eps=eps,
                            save_acts=save_acts, skips=skips)


def supports_rays(params, use_viewdirs: bool, num_semantic: int, depth: int,
                  width: int, multires: int, multires_views: int,
                  skips=()) -> bool:
    """Whether the v4 per-ray kernels (:func:`fused_nerf_apply_rays`) cover
    this model shape. Unlike the v3 predicate (``fused_mlp.supports``) this
    admits the reference's DEFAULT topology — netdepth up to 8 with the
    skip concat (``run_nerf_helpers.py:77-174``, default netdepth=8 skip@4,
    ``run_nerf.py:693``) — implemented as a second matmul on the encoding
    rows at each skip layer."""
    from depth_lidar_nerf_tpu.ops import fused_mlp

    if not use_viewdirs or num_semantic > 0 or depth > 8 or depth < 1:
        return False
    ls = _live_skips(depth, skips)
    if any(s >= depth - 1 for s in (skips or ()) if s < depth):
        # A concat consumed by the heads (skip at the LAST trunk layer)
        # changes the head input width; not implemented.
        return False
    e_p, e_v = 3 + 6 * multires, 3 + 6 * multires_views
    if e_p + e_v > fused_mlp._PACK:
        return False
    p = params["params"] if "params" in params else params
    if "semantic_0" in p:
        return False
    if p["trunk_0"]["kernel"].shape[0] != e_p:
        return False
    for i in range(1, depth):
        want = width + (e_p if (i - 1) in ls else 0)
        if f"trunk_{i}" not in p:
            return False
        if p[f"trunk_{i}"]["kernel"].shape[0] != want:
            return False
    if p["views_0"]["kernel"].shape[0] != width + e_v:
        return False
    return p["trunk_0"]["kernel"].shape[1] == width and width in (128, 256)


def supports_semantic(params, use_viewdirs: bool, depth: int, width: int,
                      multires: int, multires_views: int,
                      skips=()) -> bool:
    """Whether the semantic-head acts path (:func:`fused_nerf_apply_rays_semantic`)
    covers this model shape: the base fused topology PLUS semantic_0/1."""
    from depth_lidar_nerf_tpu.ops import fused_mlp

    if not use_viewdirs or depth > 8 or depth < 1:
        return False
    if any(s >= depth - 1 for s in (skips or ()) if s < depth):
        # A concat consumed by the heads (skip at the LAST trunk layer)
        # changes the head + semantic-head input widths; not implemented.
        return False
    p = params["params"] if "params" in params else params
    if "semantic_0" not in p or "semantic_1" not in p:
        return False
    e_p, e_v = 3 + 6 * multires, 3 + 6 * multires_views
    if e_p + e_v > fused_mlp._PACK:
        return False
    if p["trunk_0"]["kernel"].shape[0] != e_p:
        return False
    ls = _live_skips(depth, skips)
    for i in range(1, depth):
        want = width + (e_p if (i - 1) in ls else 0)
        if f"trunk_{i}" not in p:
            return False
        if p[f"trunk_{i}"]["kernel"].shape[0] != want:
            return False
    if p["views_0"]["kernel"].shape[0] != width + e_v:
        return False
    return p["trunk_0"]["kernel"].shape[1] == width and width in (128, 256)


def fused_nerf_apply_rays_semantic(params, rays_o, rays_d, viewdirs, z_vals,
                                   *, depth, width, multires, multires_views,
                                   dtype=jnp.bfloat16, mesh=None,
                                   ray_axis="rays", skips=()):
    """Semantic-head variant: returns (raw [4, N, S], ray-summed semantic
    logits [N, C]).

    The reference's semantic head (run_nerf_helpers.py:109: two Dense layers
    off the pre-view ``feature`` vector) AND its unweighted sum over samples
    (run_nerf_helpers.py:589) both run IN-KERNEL: the [N, S, C] per-point
    logits never exist in HBM, and the backward takes the per-ray [N, C]
    cotangent directly (round 2's out-of-kernel head paid a ~2KB/point f32
    feature-cotangent HBM round-trip instead). Both passes use the
    saved-acts (no-recompute) backward — transmittance culling is
    structurally incompatible with the semantic composite (no sample's
    cotangent is ever zero).
    """
    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P_

        core = functools.partial(
            _apply_rays_semantic_core, depth=depth, width=width,
            multires=multires, multires_views=multires_views, dtype=dtype,
            skips=skips)
        return jax.shard_map(
            core, mesh=mesh,
            in_specs=(P_(), P_(ray_axis), P_(ray_axis), P_(ray_axis),
                      P_(ray_axis)),
            out_specs=(P_(None, ray_axis), P_(ray_axis)),
            check_vma=False,
        )(params, rays_o, rays_d, viewdirs, z_vals)
    return _apply_rays_semantic_core(
        params, rays_o, rays_d, viewdirs, z_vals, depth=depth, width=width,
        multires=multires, multires_views=multires_views, dtype=dtype,
        skips=skips)


def _apply_rays_semantic_core(params, rays_o, rays_d, viewdirs, z_vals, *,
                              depth, width, multires, multires_views, dtype,
                              skips=()):
    skips = _live_skips(depth, skips)
    N, S = z_vals.shape
    tile_f = _fwd_tile_size(S)
    rpt = _acts_pad_rays_per_tile(S, depth, width, dtype)
    n_pad = (-N) % rpt
    n_full = N + n_pad
    if n_pad:
        rays_o = jnp.pad(rays_o, ((0, n_pad), (0, 0)))
        rays_d = jnp.pad(rays_d, ((0, n_pad), (0, 0)))
        viewdirs = jnp.pad(viewdirs, ((0, n_pad), (0, 0)))
        z_vals = jnp.pad(z_vals, ((0, n_pad), (0, 0)))

    ot = rays_o.astype(jnp.float32).T[:, :, None]
    dt_ = rays_d.astype(jnp.float32).T[:, :, None]
    ptsT = (ot + dt_ * z_vals.astype(jnp.float32)[None]).reshape(3, n_full * S)
    vdT = viewdirs.astype(jnp.float32).T
    vt_f = _build_vt(vdT, n_full, S, tile_f)
    t_a = _acts_tile_fwd(S, depth, width, dtype)
    vt_a = vt_f if t_a == tile_f else _build_vt(vdT, n_full, S, t_a)
    p = params["params"] if "params" in params else params
    C = p["semantic_1"]["kernel"].shape[1]
    spec = (depth, dtype, S, tile_f, multires, multires_views, C, skips)
    raw_t, sem_ray = _fused_t_sem(params, ptsT, vt_a, vt_f, spec)

    raw = raw_t.reshape(4, n_full, S)
    if n_pad:
        raw, sem_ray = raw[:, :N], sem_ray[:N]
    return raw, sem_ray


def _acts_pad_rays_per_tile(S: int, depth: int, width: int, dtype) -> int:
    """Ray-pad unit for the saved-acts paths: the LCM (not max) of the three
    grids' rays-per-tile — each pallas grid floor-divides P by ITS OWN tile,
    so the padded ray count must be divisible by every pass's rays-per-tile.
    The VMEM-capped acts tiles are _TILE multiples but not necessarily
    divisors of the forward tile (e.g. 6144 vs 8192 at D=5/f32), where
    max-padding would silently drop the tail points from the acts grid."""
    return math.lcm(_fwd_tile_size(S) // S,
                    _acts_tile_fwd(S, depth, width, dtype) // S,
                    _acts_tile(S, depth, width, dtype) // S)


def semantic_padded_rays(n_rays: int, S: int, depth: int, width: int,
                         dtype=jnp.bfloat16) -> int:
    """Ray count after the semantic acts path's padding — what the HBM acts
    byte budget must actually admit (dispatch predicates that check the cap
    at the unpadded count undercount by up to rpt - 1 rays)."""
    rpt = _acts_pad_rays_per_tile(S, depth, width, dtype)
    return n_rays + (-n_rays) % rpt


def _fwd_tile_size(S: int) -> int:
    """Forward tile: as large as the [3, 128] viewdir block allows, a
    multiple of the backward tile, capped by DLNERF_FUSED_TILE_FWD."""
    cap = min(_TILE_FWD, 128 * S)
    return max(_TILE, (cap // _TILE) * _TILE)


def _build_vt(viewdirs_t, n_full, S, tile):
    """Per-tile viewdir layout: [3, n_tiles, R] lane-padded to 128."""
    R = tile // S
    n_tiles = n_full * S // tile
    v = viewdirs_t.reshape(3, n_tiles, R)
    v = jnp.pad(v, ((0, 0), (0, 0), (0, 128 - R)))
    return v.reshape(3, n_tiles * 128)


def _apply_rays_core(params, rays_o, rays_d, viewdirs, z_vals, key=None,
                     deltas=None, noise=None, *, depth, width, multires,
                     multires_views, dtype, cull_bwd, fwd_eps=0.0,
                     save_acts=False, skips=()):
    N, S = z_vals.shape
    skips = _live_skips(depth, skips)
    sb = min(_SAMPLE_BLOCK, S)
    blocks_ok = S % sb == 0 and _TILE // sb <= 128
    # The cf kernel's viewdir layout assumes exactly 128 rays per block.
    # (The early-terminating forward has no skip-topology variant: it is
    # off by default anyway — see cull_fwd_enabled.)
    use_cf = (key is not None and fwd_eps > 0.0 and blocks_ok
              and _TILE // sb == 128 and cull_fwd_enabled() and not skips)

    tile_f = _fwd_tile_size(S)
    # The cf path regroups into (RB x SB) blocks, so rays pad to RB; the
    # dense forward pads to its (larger) tile's ray count; the saved-acts
    # path pads to the LCM over all three grids so its divisibility guards
    # below hold whenever the byte cap admits the batch (padding only to
    # tile_f would permanently disengage the acts backward when the
    # VMEM-capped acts tile doesn't divide tile_f, e.g. D=5..6/f32).
    if use_cf:
        rays_per_ftile = _TILE // sb
    elif save_acts and bwd_acts_enabled():
        rays_per_ftile = _acts_pad_rays_per_tile(S, depth, width, dtype)
    else:
        rays_per_ftile = tile_f // S
    n_pad = (-N) % rays_per_ftile
    n_full = N + n_pad
    if n_pad:
        rays_o = jnp.pad(rays_o, ((0, n_pad), (0, 0)))
        rays_d = jnp.pad(rays_d, ((0, n_pad), (0, 0)))
        viewdirs = jnp.pad(viewdirs, ((0, n_pad), (0, 0)))
        z_vals = jnp.pad(z_vals, ((0, n_pad), (0, 0)))
        if use_cf:
            # Padded rays sort last and never terminate (delta 0 -> T = 1);
            # only their own blocks stay live.
            key = jnp.pad(key, (0, n_pad), constant_values=jnp.inf)
            deltas = jnp.pad(deltas, ((0, n_pad), (0, 0)))
            noise = jnp.pad(noise, ((0, n_pad), (0, 0)))

    # ptsT [3, N, S]: lanes = S, no padding waste; reshape to [3, P] is free.
    ot = rays_o.astype(jnp.float32).T[:, :, None]
    dt_ = rays_d.astype(jnp.float32).T[:, :, None]
    ptsT = (ot + dt_ * z_vals.astype(jnp.float32)[None]).reshape(3, n_full * S)
    vdT = viewdirs.astype(jnp.float32).T
    cull = bool(cull_bwd) and blocks_ok

    if use_cf:
        vt_b = _build_vt(vdT, n_full, S, _TILE)
        aux = (key.astype(jnp.float32), deltas.astype(jnp.float32),
               noise.astype(jnp.float32))
        spec = (depth, dtype, S, multires, multires_views, sb, float(fwd_eps))
        raw_t = _fused_t_cf(params, ptsT, vdT, vt_b, aux, spec)
    elif (save_acts and bwd_acts_enabled()
          and n_full * S <= acts_points_cap(depth, width, dtype)
          and n_full % (_acts_tile(S, depth, width, dtype) // S) == 0
          and n_full % (_acts_tile_fwd(S, depth, width, dtype) // S) == 0):
        vt_f = _build_vt(vdT, n_full, S, tile_f)
        t_a = _acts_tile_fwd(S, depth, width, dtype)
        vt_a = vt_f if t_a == tile_f else _build_vt(vdT, n_full, S, t_a)
        spec = (depth, dtype, S, tile_f, multires, multires_views, skips)
        raw_t = _fused_t_acts(params, ptsT, vt_a, vt_f, spec)
    else:
        # Viewdir layouts for the forward (tile_f) and backward (_TILE) grids.
        vt_f = _build_vt(vdT, n_full, S, tile_f)
        vt_b = vt_f if tile_f == _TILE else _build_vt(vdT, n_full, S, _TILE)
        spec = (depth, dtype, S, tile_f, multires, multires_views, skips,
                cull, sb)
        raw_t = _fused_t(params, ptsT, vt_f, vt_b, spec)  # [4, P]
    out = raw_t.reshape(4, n_full, S)
    return out[:, :N] if n_pad else out


# ------------------------------------------------------ int8 serving forward
#
# Eval-only W8A8 path for render/serving calls: weights are quantized
# per-output-column to int8 at dispatch, activations per-point (per tile row)
# dynamically in-kernel, and every wide matmul (trunk, feature, view branch)
# runs s8 x s8 -> s32 on the MXU — which executes int8 at 2x the bf16 rate on
# v5e-class chips. The first layer (K = 3 + 6*multires, half-filled array
# anyway), the skip-concat matmuls, and the M=4 heads stay bf16: their pass
# count doesn't shrink under int8, so quantizing them would only add VPU
# work. There is NO backward — the renderer dispatches this path only for
# pure render calls (RenderConfig.render_int8), never inside a loss.

def _quant_cols(w):
    """Per-output-column symmetric int8 quantization of a [K, N] weight.

    Returns (q int8 [K, N], scale f32 [1, N]) with w ~= q * scale."""
    m = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    s = jnp.maximum(m, 1e-30) * (1.0 / 127.0)
    return jnp.round(w.astype(jnp.float32) / s).astype(jnp.int8), s


def _qdot(h, wq, srow):
    """Dynamic per-row W8A8 matmul: h [T, K] (bf16/f32) x wq [K, N] int8
    (per-column scales ``srow`` [1, N] f32) -> f32 [T, N].

    The activation scale is the per-point (row) max-abs — exact zero rows
    get scale eps and quantize to all-zero. Rounding h*r happens in f32
    (integers <= 127 are exact in every float width)."""
    hf = h.astype(jnp.float32)
    m = jnp.max(jnp.abs(hf), axis=1, keepdims=True)  # [T, 1]
    r = 127.0 / jnp.maximum(m, 1e-30)
    q = jnp.round(hf * r).astype(jnp.int8)
    acc = jax.lax.dot_general(q, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * ((m * (1.0 / 127.0)) * srow)


def _pack_params_q8(params, depth, n_p, n_v, dtype, skips=()):
    """Quantized weight pack: the bf16 pack with trunk/feature/view-f weights
    replaced by int8 twins and their column scales stacked into one
    [pad8(depth + 1), W] f32 matrix (rows 0..depth-2 trunk, depth-1 feature,
    depth view-f — lane-padded from W/2)."""
    flat = _pack_params(params, depth, n_p, n_v, dtype, skips)
    (w1, b1, tw, tb, sw, wfs, bfs, wsig, wvf, wve, bv, wr, br) = _unflatten(
        flat, depth, skips)
    W = wfs.shape[0]
    twq, scales = [], []
    for k in tw:
        q, s = _quant_cols(k)
        twq.append(q)
        scales.append(s)
    wfsq, s_f = _quant_cols(wfs)
    wvfq, s_v = _quant_cols(wvf)  # [1, W/2]
    s_v = jnp.pad(s_v, ((0, 0), (0, W - s_v.shape[1])))
    sc = jnp.concatenate(scales + [s_f, s_v], axis=0)  # [depth + 1, W]
    sc = jnp.pad(sc, ((0, (-sc.shape[0]) % 8), (0, 0)))
    sws = [sw[k] for k in sorted(sw)]
    return [w1, b1, *twq, *tb, *sws, wfsq, bfs, wsig, wvfq, wve, bv, wr, br,
            sc]


def _forward_tile_q8(spec, xt, vt, ws):
    """One tile of the quantized serving forward (cf. :func:`_forward_tile`;
    same math modulo int8 rounding on the wide matmuls). Returns
    ``(raw [4, T], feat [T, W])`` — the feature feeds the (bf16) semantic
    head in the semantic variant."""
    depth, dtype, S, R = spec[:4]
    (w1, b1, twq, tb, sw, wfsq, bfs, wsig, wvfq, wve, bv, wr, br, sc) = ws
    W = wfsq.shape[0]

    relu = _relu_cast
    enc_x = _encode_t(xt, (w1.shape[0] - 3) // 6, dtype)
    h = relu(_dot_c0(enc_x, w1) + b1, dtype)
    for i in range(depth - 1):
        acc = _qdot(h, twq[i], sc[i:i + 1, :]) + tb[i]
        if i in sw:
            acc = acc + _dot_c0(enc_x, sw[i])
        h = relu(acc, dtype)

    feat = (_qdot(h, wfsq, sc[depth - 1:depth, :]) + bfs).astype(dtype)
    sigT = jax.lax.dot_general(wsig, h, (((0,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)

    enc_v = _encode_t(vt[:, :R], (wve.shape[0] - 3) // 6, dtype)
    hv_ray = _dot_c0(enc_v, wve).astype(dtype)  # [R, W/2]
    E = _expand_matrix(R, S, dtype)
    Wv = wvfq.shape[1]
    hv = relu(_qdot(feat, wvfq, sc[depth:depth + 1, :Wv])
              + _dot(E, hv_ray) + bv, dtype)

    rgbT = jax.lax.dot_general(wr, hv, (((0,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    return rgbT + sigT + br, feat


def _unflatten_q8(flat, depth, skips=()):
    *core, sc = flat
    (w1, b1, twq, tb, sw, wfsq, bfs, wsig, wvfq, wve, bv, wr, br) = _unflatten(
        core, depth, skips)
    return (w1, b1, twq, tb, sw, wfsq, bfs, wsig, wvfq, wve, bv, wr, br, sc)


def _fwd_kernel_q8(spec, xt_ref, vt_ref, *refs):
    out_ref = refs[-1]
    ws = _unflatten_q8([r[:] for r in refs[:-1]], spec[0], _spec_skips(spec))
    out_ref[:], _ = _forward_tile_q8(spec, xt_ref[:], vt_ref[:], ws)


def _fwd_kernel_q8_sem(spec, xt_ref, vt_ref, *refs):
    """Quantized semantic serving forward: raw + ray-summed logits. The
    affine head itself stays bf16 (it runs on [R, W] per-ray feature sums —
    S-fold fewer rows, so int8 would save nothing)."""
    depth, dtype, S, R = spec[:4]
    skips = _spec_skips(spec)
    n_w = _n_ws(depth, skips) + 1  # + the stacked scale matrix
    w_refs = refs[:n_w]
    sem_refs = refs[n_w:n_w + 4]
    raw_ref, sem_ref = refs[n_w + 4:]
    ws = _unflatten_q8([r[:] for r in w_refs], depth, skips)
    out, feat = _forward_tile_q8(spec, xt_ref[:], vt_ref[:], ws)
    raw_ref[:] = out
    sem_ref[:] = _sem_head_tile(feat, [r[:] for r in sem_refs], R, S, dtype)


def _fwd_impl_q8(params, xt, vt_f, spec):
    depth, dtype, S, tile_f, n_p, n_v = spec[:6]
    skips = spec[6] if len(spec) > 6 else ()
    ws = _pack_params_q8(params, depth, n_p, n_v, dtype, skips)
    P = xt.shape[1]
    return pl.pallas_call(
        functools.partial(_fwd_kernel_q8,
                          (depth, dtype, S, tile_f // S, skips)),
        grid=(P // tile_f,),
        in_specs=[
            pl.BlockSpec((3, tile_f), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
            *[_full_spec(w.shape) for w in ws],
        ],
        out_specs=pl.BlockSpec((4, tile_f), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, P), jnp.float32),
        compiler_params=_cparams(),
        interpret=interpret_mode(),
    )(xt, vt_f, *ws)


def _fwd_impl_q8_sem(params, xt, vt_f, spec):
    depth, dtype, S, tile_f, n_p, n_v, C = spec[:7]
    skips = spec[7] if len(spec) > 7 else ()
    R = tile_f // S
    ws = _pack_params_q8(params, depth, n_p, n_v, dtype, skips)
    sem_ws = _pack_sem(params, dtype)
    P = xt.shape[1]
    return pl.pallas_call(
        functools.partial(_fwd_kernel_q8_sem, (depth, dtype, S, R, skips)),
        grid=(P // tile_f,),
        in_specs=[
            pl.BlockSpec((3, tile_f), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
            *[_full_spec(w.shape) for w in ws],
            *[_full_spec(w.shape) for w in sem_ws],
        ],
        out_specs=(pl.BlockSpec((4, tile_f), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((R, C), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((4, P), jnp.float32),
                   jax.ShapeDtypeStruct((P // S, C), jnp.float32)),
        compiler_params=_cparams(),
        interpret=interpret_mode(),
    )(xt, vt_f, *ws, *sem_ws)


def _apply_rays_q8_core(params, rays_o, rays_d, viewdirs, z_vals, *, depth,
                        width, multires, multires_views, dtype, skips=(),
                        num_classes=0):
    N, S = z_vals.shape
    skips = _live_skips(depth, skips)
    tile_f = _fwd_tile_size(S)
    n_pad = (-N) % (tile_f // S)
    n_full = N + n_pad
    if n_pad:
        rays_o = jnp.pad(rays_o, ((0, n_pad), (0, 0)))
        rays_d = jnp.pad(rays_d, ((0, n_pad), (0, 0)))
        viewdirs = jnp.pad(viewdirs, ((0, n_pad), (0, 0)))
        z_vals = jnp.pad(z_vals, ((0, n_pad), (0, 0)))
    ot = rays_o.astype(jnp.float32).T[:, :, None]
    dt_ = rays_d.astype(jnp.float32).T[:, :, None]
    ptsT = (ot + dt_ * z_vals.astype(jnp.float32)[None]).reshape(3, n_full * S)
    vt_f = _build_vt(viewdirs.astype(jnp.float32).T, n_full, S, tile_f)
    if num_classes > 0:
        spec = (depth, dtype, S, tile_f, multires, multires_views,
                num_classes, skips)
        raw, sem = _fwd_impl_q8_sem(params, ptsT, vt_f, spec)
        out = raw.reshape(4, n_full, S)
        return (out[:, :N], sem[:N]) if n_pad else (out, sem)
    spec = (depth, dtype, S, tile_f, multires, multires_views, skips)
    out = _fwd_impl_q8(params, ptsT, vt_f, spec).reshape(4, n_full, S)
    return out[:, :N] if n_pad else out


def fused_nerf_apply_rays_q8(params, rays_o, rays_d, viewdirs, z_vals, *,
                             depth, width, multires, multires_views,
                             dtype=jnp.bfloat16, mesh=None, ray_axis="rays",
                             skips=()):
    """Quantized (W8A8) serving forward: rays + z -> channel-major raw
    [4, N, S]. EVAL ONLY — there is no VJP; callers (the renderer's
    ``render_int8`` dispatch) must never differentiate through it. Topology
    coverage equals :func:`supports_rays`."""
    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P_

        core = functools.partial(
            _apply_rays_q8_core, depth=depth, width=width, multires=multires,
            multires_views=multires_views, dtype=dtype, skips=skips)
        return jax.shard_map(
            core, mesh=mesh,
            in_specs=(P_(), P_(ray_axis), P_(ray_axis), P_(ray_axis),
                      P_(ray_axis)),
            out_specs=P_(None, ray_axis),
            check_vma=False,
        )(params, rays_o, rays_d, viewdirs, z_vals)
    return _apply_rays_q8_core(params, rays_o, rays_d, viewdirs, z_vals,
                               depth=depth, width=width, multires=multires,
                               multires_views=multires_views, dtype=dtype,
                               skips=skips)


def fused_nerf_apply_rays_semantic_q8(params, rays_o, rays_d, viewdirs,
                                      z_vals, *, depth, width, multires,
                                      multires_views, dtype=jnp.bfloat16,
                                      mesh=None, ray_axis="rays", skips=()):
    """Quantized semantic serving forward: (raw [4, N, S], ray-summed
    semantic logits [N, C]). EVAL ONLY (no VJP). The trunk runs W8A8 like
    :func:`fused_nerf_apply_rays_q8`; the affine semantic head stays bf16 on
    per-ray feature sums (cf. :func:`_sem_head_tile`). No activation dump —
    unlike the train-time semantic path this has no HBM byte cap."""
    p = params["params"] if "params" in params else params
    num_classes = p["semantic_1"]["kernel"].shape[1]
    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P_

        core = functools.partial(
            _apply_rays_q8_core, depth=depth, width=width, multires=multires,
            multires_views=multires_views, dtype=dtype, skips=skips,
            num_classes=num_classes)
        return jax.shard_map(
            core, mesh=mesh,
            in_specs=(P_(), P_(ray_axis), P_(ray_axis), P_(ray_axis),
                      P_(ray_axis)),
            out_specs=(P_(None, ray_axis), P_(ray_axis)),
            check_vma=False,
        )(params, rays_o, rays_d, viewdirs, z_vals)
    return _apply_rays_q8_core(params, rays_o, rays_d, viewdirs, z_vals,
                               depth=depth, width=width, multires=multires,
                               multires_views=multires_views, dtype=dtype,
                               skips=skips, num_classes=num_classes)
