"""Config/CLI system.

Drop-in compatible with the reference's configargparse setup
(``config_parser``, ``run_nerf.py:678-882``): every flag keeps its reference
name and default, configs are the same ``key = value`` text files
(``configs/fern_dsnerf.txt`` etc.), and any flag can be overridden on the
command line with ``--flag value`` / ``--flag`` for booleans.

Implementation is a typed dataclass + a small parser (the environment has no
configargparse; this also gives us a hashable config object that the jitted
train-step factory can key on).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import List, Optional, Tuple


@dataclasses.dataclass
class TrainConfig:
    # experiment / paths
    config: Optional[str] = None
    expname: str = "exp"
    basedir: str = "./logs"
    datadir: str = "./data/llff/fern"
    no_reload_optimizer: bool = False  # note: reference flag is store_false (run_nerf.py:690)

    # network arch
    netdepth: int = 8
    netwidth: int = 256
    netdepth_fine: int = 8
    netwidth_fine: int = 256

    # optimization
    N_rand: int = 32 * 32 * 4
    lrate: float = 5e-4
    lrate_decay: int = 250
    chunk: int = 1024 * 32
    netchunk: int = 1024 * 64
    no_batching: bool = False
    no_reload: bool = False
    ft_path: Optional[str] = None

    # rendering
    N_samples: int = 64
    N_importance: int = 0
    perturb: float = 1.0
    use_viewdirs: bool = False
    i_embed: int = 0
    multires: int = 10
    multires_views: int = 4
    raw_noise_std: float = 0.0
    render_only: bool = False
    render_test: bool = False
    render_test_ray: bool = False
    render_train: bool = False
    render_mypath: bool = False
    render_factor: int = 0

    # precrop
    precrop_iters: int = 0
    precrop_frac: float = 0.5

    # dataset
    dataset_type: str = "llff"
    testskip: int = 8
    shape: str = "greek"
    white_bkgd: bool = False
    half_res: bool = False
    factor: int = 8
    no_ndc: bool = False
    lindisp: bool = False
    spherify: bool = False
    llffhold: int = 8

    # logging intervals
    i_print: int = 100
    i_img: int = 500
    i_weights: int = 10000
    i_testset: int = 50000
    i_video: int = 50000

    # debug / reproducibility
    debug: bool = False
    seed: int = 3407
    should_seed: bool = False

    # training extent / depth supervision
    N_iters: int = 200000
    alpha_model_path: Optional[str] = None
    no_coarse: bool = False
    train_scene: Optional[List[int]] = None
    test_scene: Optional[List[int]] = None
    colmap_depth: bool = False
    depth_loss: bool = False
    depth_lambda: float = 0.1
    sigma_loss: bool = False
    sigma_lambda: float = 0.1
    weighted_loss: bool = False
    relative_loss: bool = False
    depth_with_rgb: bool = False
    normalize_depth: bool = False
    depth_rays_prop: float = 0.5

    # feature (content) loss
    feature_loss: bool = False
    feature_start_iteration: int = 1000
    feature_loss_every_n: int = 15
    feature_lambda: float = 0.1
    nH: int = 32
    nW: int = 32
    gradH: int = 16
    gradW: int = 16
    feature_loss_type: str = "vgg"
    lpips_spatial: bool = False
    lpips_backbone: str = "alex"
    vgg_layers: Optional[List[str]] = None
    vgg_layer_weights: List[float] = dataclasses.field(default_factory=lambda: [1.0, 1.0])
    vgg_loss_type: str = "l2"

    # GAN loss
    gan_loss: bool = False
    gan_lambda: float = 0.1
    gan_start_iteration: int = 500
    gan_disc_lrate: float = 5e-4
    gan_noise_std: float = 0.1

    # semantic loss
    semantic_loss: bool = False
    semantic_lambda: float = 0.1
    semantic_num_classes: Optional[int] = None  # filled by the loader (run_nerf.py:917)

    # depth smoothness loss
    depth_inverse_loss: bool = False
    depth_inverse_lambda: float = 0.1
    depth_inverse_loss_every_n: int = 15

    # --- TPU-native additions (no reference counterpart) ---
    compute_dtype: str = "float32"  # "bfloat16" for MXU-speed training
    mesh_shape: Optional[List[int]] = None  # e.g. [8] -> 1-D ray-DP mesh
    # Multi-host (DCN) data parallelism: when dist_coordinator is set, the
    # CLI calls jax.distributed.initialize BEFORE any backend use and the
    # trainer runs one global ray-DP mesh over every process's devices —
    # ray tables sharded per process (each host holds only its row slice),
    # params replicated, gradient psum over ICI within hosts and DCN across
    # (parallel/distributed.py; certified by tests/test_multihost.py on a
    # 2-process x 4-virtual-device CPU mesh). On TPU pods leave
    # dist_num_processes/dist_process_id at their defaults: initialize()
    # auto-detects the pod topology.
    dist_coordinator: Optional[str] = None  # "host0:port" enables multi-host
    dist_num_processes: int = -1  # -1 = auto-detect (TPU pods)
    dist_process_id: int = -1  # -1 = auto-detect (TPU pods)
    log_every_host: int = 100
    use_pallas_sampling: bool = False
    # Pallas fused MLP (transposed in-kernel-encoding kernel, PERF.md):
    # +24% train throughput over the XLA path on v5e and ~4x lower activation
    # memory (recompute backward). Unsupported shapes fall back to Flax.
    use_fused_mlp: bool = True
    # Transmittance cull threshold: hard-zero sample weights once a ray's
    # transmittance drops below this (output change bounded by cull_eps per
    # ray; cotangents of occluded samples become exactly zero, letting the
    # fused backward skip their FLOPs). 0.0 restores strict reference math.
    cull_eps: float = 1e-4
    # Batch K optimizer steps into one device dispatch via lax.scan for
    # non-patch iterations (small N_rand cannot feed the chip one step at a
    # time; K*N_rand ~ 16k is the throughput sweet spot — PERF.md). 0 = auto
    # (min(32, 16384 // N_rand)); 1 = off. RNG folds per inner step, so the
    # loss trajectory is identical to unbatched at print precision.
    steps_per_dispatch: int = 0
    # Fuse each (plain-steps + patch-step) loss-schedule period into ONE
    # device dispatch (step.make_cycle_step): the feature/smoothness
    # every-N cadence dispatches as a single program instead of three.
    # Identical trajectory (same per-iteration rng folds); saves ~2 launch
    # latencies per period, which dominate the patch-window rate on a
    # tunneled chip (PERF.md round 5). Auto-disabled with gan_loss (past
    # gan_start every iteration is a patch iteration) and when
    # steps_per_dispatch=1.
    cycle_dispatch: bool = True
    # Per-ray sample count for the PATCH-loss renders (grad + no-grad legs)
    # in grid-train mode; 0 = N_importance. The patch renders only feed the
    # perceptual losses (VGG/LPIPS/GAN/smoothness), and the baked per-ray
    # CDF concentrates samples on the surface, so fewer samples keep the
    # patch image faithful while cutting the dominant patch-step cost
    # (~2/3 is the roofline-bound fine render — PERF.md round 5). Quality
    # A/B before enabling, like patch_ng_int8.
    patch_render_samples: int = 0
    # Quantized (W8A8, int8 MXU) forward for EVAL renders only — i_img /
    # i_testset / i_video / render_only frames. Training math (including the
    # no-grad patch render that feeds the perceptual losses) stays bf16.
    # Semantic renders run the quantized trunk with a bf16 affine head.
    render_int8: bool = False
    # Quantized (W8A8) forward for the NO-GRAD patch render leg of the
    # feature/GAN/smoothness iterations (the reference renders this leg under
    # no_grad at full precision, run_nerf.py:1600-1644; it is gradient-free
    # by construction — step.py ng_render). Opt-in: int8 introduces a bounded
    # (~2% worst-case) deviation in the no-grad pixels feeding the perceptual
    # losses; A/B final metrics before enabling on a new scene.
    patch_ng_int8: bool = False
    # Baked-density-grid serving (--render_only): bake the trained fine
    # model's sigma field onto an R^3 grid once, then replace the coarse MLP
    # pass of every rendered frame with a trilinear lookup (the fine pass
    # still runs the full MLP). 0 = off; e.g. 192 for a 192^3 bake.
    # Composes with render_int8.
    render_grid: int = 0
    # Serving accelerator on top of fine-only rendering: the coarse
    # placement pass runs at (H/k, W/k) — one ray per k x k pixel block,
    # sharing its inverse-CDF fine depths across the block — while the
    # visible fine pass stays full-res (render/renderer.py
    # render_image_coarse_downsampled). Eval/render-only. 0/1 = off.
    render_coarse_downsample: int = 0
    # Grid fine-only serving: the fine MLP evaluates ONLY the N_importance
    # samples placed by the grid CDF (not coarse + importance) — MLP evals
    # per ray drop from N_samples + (N_samples + N_importance) to
    # N_importance. Pair with render_grid_samples for a sharper CDF.
    render_grid_fine_only: bool = False
    # Stratified sample count for the grid CDF (0 = N_samples); grid
    # lookups are bandwidth-trivial so a finer CDF is ~free.
    render_grid_samples: int = 0
    # Fine-only serving WITHOUT a grid (EVAL renders only, like
    # render_int8): the coarse MLP still places the importance samples, but
    # the fine pass evaluates ONLY those N_importance samples instead of the
    # stratified+importance union — render MLP evals per ray drop from
    # N_samples + (N_samples + N_importance) to N_samples + N_importance
    # with zero gathers. Composes with render_int8. Quality A/B:
    # scripts/int8_eval.py.
    render_fine_only: bool = False
    # Baked-density-grid TRAINING (opt-in; no reference counterpart): after
    # ``grid_train_after`` warmup steps of normal two-MLP training, the
    # coarse MLP pass of the train step is replaced by a trilinear lookup of
    # a sigma grid baked from the live FINE model (re-baked from the live
    # params every ``grid_rebake_every`` steps, off the step's critical
    # path). The fine pass still evaluates the stratified + importance union
    # (N_samples + N_importance points), so sample coverage of [near, far]
    # is unchanged — only the coarse MLP's forward+backward FLOPs (~1/3 of
    # the step's MLP work) are deleted, along with its img_loss0 term (the
    # coarse MLP's only training signal, which exists purely to learn a
    # sample-placement field the grid now provides, run_nerf.py:571-600).
    # Eval renders during grid training also use the grid (the coarse MLP
    # is stale once it stops receiving gradients).
    grid_train: bool = False
    grid_train_after: int = 500
    grid_rebake_every: int = 500
    grid_train_res: int = 128
    # Aggressive variant: the fine pass evaluates ONLY the N_importance
    # samples the grid CDF placed (64 MLP evals/ray instead of 192 at the
    # flagship shape). Coverage then depends wholly on the grid; gate with
    # a quality A/B (scripts/time_to_quality.py).
    grid_train_fine_only: bool = False
    # Stratified sample count for the training grid CDF (0 = N_samples).
    grid_train_samples: int = 0
    profile_dir: Optional[str] = None  # jax.profiler trace output (TPU)
    debug_nans: bool = False  # jax.config debug_nans (reference: DEBUG scan, run_nerf.py:671-673)

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


_BOOL_FIELDS = {
    f.name for f in dataclasses.fields(TrainConfig) if f.type in ("bool", bool)
}
_LIST_INT = {"train_scene", "test_scene", "mesh_shape"}
_LIST_FLOAT = {"vgg_layer_weights"}
_LIST_STR = {"vgg_layers"}


def _parse_scalar(name: str, raw: str):
    raw = raw.strip()
    if name in _BOOL_FIELDS:
        return raw.lower() in ("true", "1", "yes")
    if name in _LIST_INT or name in _LIST_FLOAT or name in _LIST_STR:
        items = [s.strip() for s in raw.strip("[]").split(",") if s.strip()]
        if name in _LIST_INT:
            return [int(s) for s in items]
        if name in _LIST_FLOAT:
            return [float(s) for s in items]
        return items
    ftypes = {f.name: f.type for f in dataclasses.fields(TrainConfig)}
    t = ftypes.get(name)
    if t in ("int", int):
        return int(float(raw))
    if t in ("float", float):
        return float(raw)
    if raw == "None":
        return None
    # Optional[int]-style fields and strings
    if t in ("Optional[str]", "str", str):
        return raw
    try:
        return int(raw)
    except ValueError:
        try:
            return float(raw)
        except ValueError:
            return raw


def parse_config_file(path: str) -> dict:
    """Parse the reference's ``key = value`` config format."""
    out = {}
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            if "=" not in line:
                # A typo'd flag silently falling back to its default is the
                # worst failure mode a config system can have.
                raise ValueError(f"malformed config line (no '='): {line!r} "
                                 f"in {path}")
            key, value = line.split("=", 1)
            key = key.strip()
            if key not in TrainConfig.__dataclass_fields__:
                raise KeyError(f"unknown config key {key!r} in {path}")
            out[key] = _parse_scalar(key, value)
    return out


def parse_args(argv: Optional[List[str]] = None) -> TrainConfig:
    """CLI entry: ``--config file.txt`` plus per-flag overrides."""
    parser = argparse.ArgumentParser("depth-lidar-nerf-tpu trainer")
    parser.add_argument("--config", type=str, default=None)
    for f in dataclasses.fields(TrainConfig):
        if f.name == "config":
            continue
        flag = f"--{f.name}"
        if f.name in _BOOL_FIELDS:
            parser.add_argument(flag, nargs="?", const="True", default=None, type=str)
        elif f.name in _LIST_INT | _LIST_FLOAT | _LIST_STR:
            parser.add_argument(flag, nargs="*", default=None, type=str)
        else:
            parser.add_argument(flag, default=None, type=str)
    ns = parser.parse_args(argv)

    values: dict = {}
    if ns.config:
        values.update(parse_config_file(ns.config))
        values["config"] = ns.config
    for f in dataclasses.fields(TrainConfig):
        raw = getattr(ns, f.name, None)
        if raw is None or f.name == "config":
            continue
        if isinstance(raw, list):
            raw = ",".join(raw)
        values[f.name] = _parse_scalar(f.name, raw)
    return TrainConfig(**values)


def render_config_from(cfg: TrainConfig, num_semantic_classes: int,
                       near: float, far: float):
    """Derive the static RenderConfig (create_nerf/render_kwargs assembly,
    run_nerf.py:481-507)."""
    from depth_lidar_nerf_tpu.render import RenderConfig

    use_ndc = cfg.dataset_type == "llff" and not cfg.no_ndc
    return RenderConfig(
        N_samples=cfg.N_samples,
        N_importance=cfg.N_importance,
        perturb=cfg.perturb > 0,
        lindisp=cfg.lindisp if not use_ndc else False,
        raw_noise_std=cfg.raw_noise_std,
        white_bkgd=cfg.white_bkgd,
        use_viewdirs=cfg.use_viewdirs,
        multires=cfg.multires if cfg.i_embed != -1 else 0,
        multires_views=cfg.multires_views if cfg.i_embed != -1 else 0,
        num_semantic_classes=num_semantic_classes,
        ndc=use_ndc,
        near=near,
        far=far,
        use_pallas_sampling=cfg.use_pallas_sampling,
        chunk=cfg.chunk,
        netchunk=cfg.netchunk,
        cull_eps=cfg.cull_eps,
    )


def dump_args(cfg: TrainConfig) -> str:
    """args.txt content (run_nerf.py:1001-1005 parity)."""
    lines = []
    for f in sorted(dataclasses.fields(TrainConfig), key=lambda f: f.name):
        lines.append(f"{f.name} = {getattr(cfg, f.name)}")
    return "\n".join(lines) + "\n"
