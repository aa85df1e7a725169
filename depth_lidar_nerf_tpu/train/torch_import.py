"""Import the reference's torch ``.tar`` checkpoints into a TrainState.

The reference saves ``{global_step, network_fn_state_dict,
network_fine_state_dict, optimizer_state_dict[, discriminator_state_dict,
gan_noise_std, discriminator_optimizer_dict]}`` via ``torch.save``
(``run_nerf.py:1872-1883``). A user migrating from the reference can hand such
a file to ``--ft_path``: the NeRF weights (coarse + fine + semantic head), the
global step, the GAN noise std, and — when the patch shape matches — the
discriminator weights transfer; optimizer moments are left freshly
initialized (the reference itself supports exactly that via
``--no_reload_optimizer``, ``run_nerf.py:462``).

Weight mapping (reference ``NeRF``, ``run_nerf_helpers.py:77-174`` ->
:class:`models.nerf_mlp.NeRFMLP`): torch ``Linear.weight`` is ``[out, in]``,
Flax ``Dense.kernel`` is ``[in, out]`` — transpose; names map 1:1. The
positional-encoding channel layout matches the reference bit-for-bit
(``ops/embedding.py``), so transplanted first-layer weights see identical
inputs. Reading the ``.tar`` uses the torch-free zip/pickle reader
(``utils/torch_weights.py``) — no torch needed at import time.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from depth_lidar_nerf_tpu.utils.torch_weights import load_state_dict

# Flax Dense name -> reference torch module prefix.
_NERF_NAME_MAP = {
    "sigma": "alpha_linear",
    "feature": "feature_linear",
    "views_0": "views_linears.0",
    "rgb": "rgb_linear",
    "semantic_0": "semantic_linear.0",
    "semantic_1": "semantic_linear.1",
    "output": "output_linear",
}


def _dense_from_torch(sd: Dict[str, np.ndarray], prefix: str, template):
    w = np.asarray(sd[f"{prefix}.weight"])  # [out, in]
    b = np.asarray(sd[f"{prefix}.bias"])
    kernel = w.T  # [in, out]
    want = tuple(template["kernel"].shape)
    if kernel.shape != want:
        raise ValueError(
            f"reference layer {prefix!r} has shape {kernel.shape}, model "
            f"expects {want} — check netdepth/netwidth/multires flags match "
            "the checkpoint's training config")
    return {"kernel": jnp.asarray(kernel, template["kernel"].dtype),
            "bias": jnp.asarray(b, template["bias"].dtype)}


def convert_nerf_state_dict(variables, sd: Dict[str, np.ndarray]):
    """Reference ``NeRF.state_dict()`` -> NeRFMLP variables (same topology)."""
    tree = dict(variables["params"] if "params" in variables else variables)
    out = {}
    for name, leaf in tree.items():
        if name.startswith("trunk_"):
            prefix = f"pts_linears.{int(name.split('_')[1])}"
        else:
            prefix = _NERF_NAME_MAP.get(name)
        if prefix is None or f"{prefix}.weight" not in sd:
            raise KeyError(
                f"reference state_dict is missing weights for model layer "
                f"{name!r} (wanted {prefix!r}.weight) — keys: "
                f"{sorted(sd)[:8]}...")
        out[name] = _dense_from_torch(sd, prefix, leaf)
    return {"params": out} if "params" in variables else out


# Flax module name -> (torch key prefix) per discriminator arch, plus the
# final-linear (flax_name, torch_prefix, downsample_factor) — the linear
# consumes a FLATTENED feature map whose memory order differs (torch
# flattens NCHW -> (c, h, w); we flatten NHWC -> (h, w, c)).
_DISC_LAYOUTS = {
    "esr": ({"block0_conv0": "model.0", "block0_conv1": "model.2",
             "block1_conv0": "model.4", "block1_conv1": "model.6"},
            ("classifier", "classifier.0", 4)),
    "ls": ({f"block{i}_conv": f"model.{2 * i}" for i in range(4)},
           ("adv", "adv_layer", 16)),
    "basic": ({"conv": "model.0"}, ("adv", "adv_layer", 2)),
}


def convert_discriminator(variables, sd: Dict[str, np.ndarray],
                          patch_hw: Optional[tuple] = None,
                          arch: str = "esr"):
    """Reference discriminator state_dict -> the matching Flax module.

    ``arch``: "esr" (``discriminator.py:19-61``, what the train loop
    instantiates), "ls" (``:64-91``), "basic" (``:93-117``) or "dc"
    (``:118-151``). Conv kernels go OIHW -> HWIO; the final linear's weight
    is permuted for the flatten order; ``patch_hw`` is the (nH, nW) train
    patch the reference baked into that linear's input size. The DC variant
    is all bias-free convs and has no linear (its ``conv_out`` collapses the
    4x4 map), so neither patch_hw nor a bias is consumed.
    """
    tree = dict(variables["params"] if "params" in variables else variables)
    if arch == "dc":
        out = {}
        for name, leaf in tree.items():
            key = ("conv_out.weight" if name == "conv_out"
                   else f"blocks.{int(name[len('block'):])}.weight")
            w = np.asarray(sd[key])  # [O, I, 4, 4]
            out[name] = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0),
                                               leaf["kernel"].dtype)}
        return {"params": out} if "params" in variables else out
    conv_map, (lin_name, lin_key, ds) = _DISC_LAYOUTS[arch]
    out = {}
    for name, leaf in tree.items():
        if name in conv_map:
            w = np.asarray(sd[f"{conv_map[name]}.weight"])  # [O, I, 3, 3]
            out[name] = {
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0),
                                      leaf["kernel"].dtype),
                "bias": jnp.asarray(np.asarray(sd[f"{conv_map[name]}.bias"]),
                                    leaf["bias"].dtype),
            }
        elif name == lin_name:
            w = np.asarray(sd[f"{lin_key}.weight"])  # [1, C*h*w]
            want = tuple(leaf["kernel"].shape)  # [h*w*C, 1]
            if w.size != want[0]:
                raise ValueError(
                    f"discriminator {lin_name} expects {want[0]} inputs, "
                    f"checkpoint has {w.size} — patch nH/nW differ from the "
                    "reference run's")
            if patch_hw is None:
                raise ValueError("patch_hw (nH, nW) is required to permute "
                                 "the linear weight's flatten order")
            h, w_ = patch_hw[0] // ds, patch_hw[1] // ds
            c = w.size // (h * w_)
            kernel = w.reshape(1, c, h, w_).transpose(0, 2, 3, 1).reshape(1, -1).T
            out[name] = {
                "kernel": jnp.asarray(kernel, leaf["kernel"].dtype),
                "bias": jnp.asarray(np.asarray(sd[f"{lin_key}.bias"]),
                                    leaf["bias"].dtype),
            }
        else:
            raise KeyError(f"unexpected discriminator layer {name!r}")
    return {"params": out} if "params" in variables else out


def convert_esr_discriminator(variables, sd: Dict[str, np.ndarray],
                              patch_hw: Optional[tuple] = None):
    """ESR layout of :func:`convert_discriminator` (the checkpoint-import
    path: the reference train loop instantiates ESR, run_nerf.py:1253)."""
    return convert_discriminator(variables, sd, patch_hw, arch="esr")


def _torch_param_names(sd: Dict[str, np.ndarray]):
    """Reference ``NeRF.parameters()`` order, reconstructed from a state_dict.

    torch yields parameters in attribute-registration order
    (``run_nerf_helpers.py:90-110``): pts_linears, views_linears,
    feature_linear, alpha_linear, rgb_linear[, semantic_linear.{0,1}] (or
    output_linear when viewdirs are off), each Linear giving weight then bias.
    """
    names = []
    d = 0
    while f"pts_linears.{d}.weight" in sd:
        names += [f"pts_linears.{d}.weight", f"pts_linears.{d}.bias"]
        d += 1
    for prefix in ("views_linears.0", "feature_linear", "alpha_linear",
                   "rgb_linear", "output_linear", "semantic_linear.0",
                   "semantic_linear.1"):
        if f"{prefix}.weight" in sd:
            names += [f"{prefix}.weight", f"{prefix}.bias"]
    return names


def _moments_for_model(variables, sd, opt_sd, index_of: Dict[int, int],
                       base: int):
    """(mu, nu) trees shaped like ``variables`` from torch Adam exp_avg(_sq).

    ``index_of`` maps grad_vars position -> key in ``opt_sd['state']``;
    ``base`` is this model's offset in grad_vars (fine params follow coarse,
    ``run_nerf.py:434-436``).
    """
    names = _torch_param_names(sd)
    pos = {n: base + i for i, n in enumerate(names)}
    tree = variables["params"] if "params" in variables else variables

    def grab(prefix, which, template, transpose):
        st = opt_sd["state"][index_of[pos[f"{prefix}.{which}"]]]
        mu = np.asarray(st["exp_avg"])
        nu = np.asarray(st["exp_avg_sq"])
        if transpose:
            mu, nu = mu.T, nu.T
        dt = template.dtype
        return jnp.asarray(mu, dt), jnp.asarray(nu, dt)

    mu_t, nu_t = {}, {}
    for name, leaf in tree.items():
        prefix = (f"pts_linears.{int(name.split('_')[1])}"
                  if name.startswith("trunk_") else _NERF_NAME_MAP[name])
        km, kn = grab(prefix, "weight", leaf["kernel"], True)
        bm, bn = grab(prefix, "bias", leaf["bias"], False)
        mu_t[name] = {"kernel": km, "bias": bm}
        nu_t[name] = {"kernel": kn, "bias": bn}
    if "params" in variables:
        return {"params": mu_t}, {"params": nu_t}
    return mu_t, nu_t


def import_adam_state(optimizer, params, ckpt: Dict, step: int):
    """Rebuild the optax Adam state from the reference's
    ``optimizer_state_dict`` so training continues with the exact moments.

    The reference optimizes ``list(coarse.parameters()) +
    list(fine.parameters())`` with one Adam (``run_nerf.py:434-441``); optax
    ``adam`` is ``scale_by_adam`` + a schedule step counter. Moments map
    name-for-name (weights transposed like the params); both counters take
    the checkpoint's global step (torch stores the same count per param).
    Returns ``None`` when the checkpoint has no usable Adam state.
    """
    opt_sd = ckpt.get("optimizer_state_dict") or {}
    if not opt_sd.get("state"):
        return None
    group = opt_sd["param_groups"][0]["params"]
    index_of = dict(enumerate(group))  # grad_vars position -> state key

    coarse_sd = ckpt["network_fn_state_dict"]
    mu, nu = _moments_for_model(params["coarse"], coarse_sd, opt_sd,
                                index_of, 0)
    mu, nu = {"coarse": mu}, {"coarse": nu}
    # params["fine"] is None for coarse-only models (N_importance=0) — the
    # moment trees must mirror that structure exactly for optax.
    if params.get("fine") is not None:
        fine_sd = ckpt["network_fine_state_dict"]
        base = len(_torch_param_names(coarse_sd))
        mu_f, nu_f = _moments_for_model(params["fine"], fine_sd, opt_sd,
                                        index_of, base)
        mu["fine"], nu["fine"] = mu_f, nu_f
    elif "fine" in params:
        mu["fine"], nu["fine"] = None, None

    return _set_counts_and_moments(optimizer, params, mu, nu, step)


def _set_counts_and_moments(optimizer, params, mu, nu, step):
    """Fresh ``optimizer.init(params)`` with counts/moments transplanted.

    NB: check ``_fields``, not ``hasattr`` — every (named)tuple has a
    ``count`` METHOD, so hasattr is true even for ``optax.EmptyState``."""
    count = jnp.asarray(step, jnp.int32)
    out = []
    for s in optimizer.init(params):
        fields = getattr(type(s), "_fields", ())
        if "mu" in fields and "nu" in fields:
            s = s._replace(count=count, mu=mu, nu=nu)
        elif "count" in fields:
            s = s._replace(count=count)
        out.append(s)
    return tuple(out)


def import_disc_adam_state(optimizer, disc_params, ckpt: Dict, step: int,
                           patch_hw: Optional[tuple] = None):
    """Rebuild the discriminator Adam state from
    ``discriminator_optimizer_dict`` (run_nerf.py:1264,1287,1881).

    Reference ESRDiscriminator registers ``classifier`` BEFORE ``model``
    (discriminator.py:49-55), so ``parameters()`` order is classifier.0
    weight/bias then the four convs — the moment arrays map through the
    same OIHW->HWIO / flatten-order transforms as the weights, which
    :func:`convert_discriminator` already implements. Returns ``None``
    when the checkpoint has no usable state.
    """
    opt_sd = ckpt.get("discriminator_optimizer_dict") or {}
    if not opt_sd.get("state"):
        return None
    group = opt_sd["param_groups"][0]["params"]
    index_of = dict(enumerate(group))
    # grad_vars order -> torch key names (classifier first; see docstring).
    names = ["classifier.0.weight", "classifier.0.bias"]
    for i in (0, 2, 4, 6):
        names += [f"model.{i}.weight", f"model.{i}.bias"]

    def fake_sd(which):
        return {n: np.asarray(opt_sd["state"][index_of[pos]][which])
                for pos, n in enumerate(names)}

    mu = convert_discriminator(disc_params, fake_sd("exp_avg"), patch_hw,
                               arch="esr")
    nu = convert_discriminator(disc_params, fake_sd("exp_avg_sq"), patch_hw,
                               arch="esr")
    return _set_counts_and_moments(optimizer, disc_params, mu, nu, step)


def _nerf_to_torch_state_dict(variables) -> Dict[str, np.ndarray]:
    """NeRFMLP variables -> reference ``NeRF.state_dict()`` numpy arrays."""
    tree = variables["params"] if "params" in variables else variables
    out = {}
    for name, leaf in tree.items():
        prefix = (f"pts_linears.{int(name.split('_')[1])}"
                  if name.startswith("trunk_") else _NERF_NAME_MAP[name])
        out[f"{prefix}.weight"] = np.asarray(leaf["kernel"]).T.copy()
        out[f"{prefix}.bias"] = np.asarray(leaf["bias"]).copy()
    return out


def export_reference_checkpoint(state, path: str, *,
                                verbose: bool = True) -> str:
    """Write ``state`` as a reference-format torch ``.tar`` checkpoint.

    The inverse of :func:`import_reference_checkpoint`: coarse/fine NeRF
    weights land under ``network_fn_state_dict`` / ``network_fine_state_dict``
    with the reference's key names and ``[out, in]`` Linear layout, plus
    ``global_step`` — loadable by the reference's own
    ``model.load_state_dict(ckpt[...])`` resume path (``run_nerf.py:458-477``,
    dict-intersection partial load). Writing the torch zip format requires a
    working ``import torch`` (CPU wheel suffices); importing does not.
    """
    import torch  # writing torch's zip format needs torch itself

    ckpt = {
        "global_step": int(np.asarray(state.step)),
        "network_fn_state_dict": {
            k: torch.from_numpy(v)
            for k, v in _nerf_to_torch_state_dict(
                state.params["coarse"]).items()},
        "optimizer_state_dict": {},
    }
    if state.params.get("fine") is not None:
        ckpt["network_fine_state_dict"] = {
            k: torch.from_numpy(v)
            for k, v in _nerf_to_torch_state_dict(
                state.params["fine"]).items()}
    torch.save(ckpt, path)
    if verbose:
        print(f"exported reference-format checkpoint to {path} "
              f"(step {ckpt['global_step']})")
    return path


def import_reference_checkpoint(path: str, state, *,
                                patch_hw: Optional[tuple] = None,
                                optimizer=None,
                                disc_optimizer=None,
                                verbose: bool = True):
    """Load a reference ``.tar`` checkpoint file into ``state`` (a TrainState).

    Returns the updated state. Transfers: coarse params
    (``network_fn_state_dict``), fine params (``network_fine_state_dict``,
    when the state has a fine model), step (``global_step``), GAN noise std,
    and — if both sides have one and ``patch_hw`` is given — the
    discriminator. Optimizer moments stay fresh.
    """
    ckpt = load_state_dict(path)
    params = dict(state.params)
    params["coarse"] = convert_nerf_state_dict(
        state.params["coarse"], ckpt["network_fn_state_dict"])
    # params["fine"] is None for coarse-only models (N_importance=0); a
    # coarse-only reference run likewise saves network_fine_state_dict=None
    # (run_nerf.py:1877).
    if params.get("fine") is not None:
        fine_sd = ckpt.get("network_fine_state_dict")
        if fine_sd is None:
            raise KeyError("model has a fine network but the checkpoint has "
                           "no network_fine_state_dict")
        params["fine"] = convert_nerf_state_dict(state.params["fine"], fine_sd)
    updates = {"params": params}

    disc_sd = ckpt.get("discriminator_state_dict")
    if disc_sd is not None and getattr(state, "disc_params", None) is not None:
        try:
            updates["disc_params"] = convert_esr_discriminator(
                state.disc_params, disc_sd, patch_hw)
        except (KeyError, ValueError) as e:
            if verbose:
                print(f"discriminator not imported ({e}); keeping fresh init")

    step = int(np.asarray(ckpt.get("global_step", 0)))
    if optimizer is not None:
        try:
            opt_state = import_adam_state(optimizer, params, ckpt, step)
            if opt_state is not None:
                updates["opt_state"] = opt_state
        except (KeyError, ValueError, IndexError) as e:
            if verbose:
                print(f"optimizer moments not imported ({e}); keeping fresh "
                      "init (--no_reload_optimizer semantics)")
    if disc_optimizer is not None and "disc_params" in updates:
        try:
            dstate = import_disc_adam_state(
                disc_optimizer, updates["disc_params"], ckpt, step, patch_hw)
            if dstate is not None:
                updates["disc_opt_state"] = dstate
        except (KeyError, ValueError, IndexError) as e:
            if verbose:
                print(f"discriminator moments not imported ({e}); keeping "
                      "fresh init")
    new_state = state.replace(step=jnp.asarray(step, jnp.int32), **updates)
    if verbose:
        moved = ", ".join(sorted(updates))
        print(f"imported reference checkpoint {path} (step {step}; {moved})")
    return new_state
