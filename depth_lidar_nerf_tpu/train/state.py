"""Model + optimizer factory and the train state pytree.

Equivalent of ``create_nerf`` (``run_nerf.py:389-517``): builds the coarse and
fine NeRF MLPs, the Adam optimizer with the reference's continuous exponential
LR decay ``lrate * 0.1^(step / (lrate_decay * 1000))`` (``run_nerf.py:1843-1847``
— here a proper optax schedule instead of mutating param groups), and
optionally the GAN discriminator with its own Adam
(``run_nerf.py:1253-1264``).
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from depth_lidar_nerf_tpu.models import ESRDiscriminator, NeRFMLP, VGG19Features
from depth_lidar_nerf_tpu.ops.embedding import embedding_dim
from depth_lidar_nerf_tpu.render.renderer import RenderConfig
from depth_lidar_nerf_tpu.train.config import TrainConfig


class FusedMLP:
    """Duck-types ``NeRFMLP`` init/apply, dispatching supported shapes to the
    fused Pallas kernel (ops/fused_mlp.py) and everything else to Flax.

    With a multi-device ``mesh`` the kernel entries are shard_mapped over the
    ray axis (pallas_call is opaque to GSPMD, so the kernel runs per-shard and
    the weight-gradient psum rides ICI); ray batches not divisible by the mesh
    fall back to the partitionable Flax path via :meth:`rays_ok`.
    """

    def __init__(self, module: NeRFMLP, mesh=None):
        self.module = module
        self.dtype = module.dtype
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None

    def rays_ok(self, n_rays: int) -> bool:
        """Whether an n-ray batch can be shard_mapped on this mesh."""
        return self.mesh is None or n_rays % self.mesh.size == 0

    def init(self, *args, **kwargs):
        return self.module.init(*args, **kwargs)

    def apply(self, params, pts_embed, views_embed=None, frozen_sigma=None):
        return self.module.apply(params, pts_embed, views_embed,
                                 frozen_sigma=frozen_sigma)

    def supports_raw(self, params, cfg) -> bool:
        """Whether the in-kernel-encoding fast path covers this call."""
        from depth_lidar_nerf_tpu.ops import fused_mlp

        if (jax.default_backend() not in ("tpu", "axon")
                and not fused_mlp.interpret_mode()):
            return False
        return fused_mlp.supports(
            params, self.module.use_viewdirs,
            self.module.num_semantic_classes, self.module.depth,
            self.module.width, S=-1, multires=cfg.multires,
            multires_views=cfg.multires_views,
            skips=self.module.skips) is not False

    def supports_rays_path(self, params, cfg) -> bool:
        """Whether the v4 per-ray kernels cover this call — a superset of
        :meth:`supports_raw` that also admits the reference-default topology
        (netdepth 8 with the skip concat, run_nerf_helpers.py:77-174)."""
        from depth_lidar_nerf_tpu.ops import fused_mlp, fused_mlp_t

        if (jax.default_backend() not in ("tpu", "axon")
                and not fused_mlp.interpret_mode()):
            return False
        return fused_mlp_t.supports_rays(
            params, self.module.use_viewdirs,
            self.module.num_semantic_classes, self.module.depth,
            self.module.width, multires=cfg.multires,
            multires_views=cfg.multires_views, skips=self.module.skips)

    def apply_raw(self, params, pts, viewdirs, cfg):
        """Raw fast path: pts [N, S, 3], unit viewdirs [N, 3] -> raw."""
        from depth_lidar_nerf_tpu.ops import fused_mlp

        return fused_mlp.fused_nerf_apply_raw(
            params, pts, viewdirs, depth=self.module.depth,
            width=self.module.width, multires=cfg.multires,
            multires_views=cfg.multires_views, dtype=self.module.dtype,
            mesh=self.mesh)

    def supports_raw_semantic(self, params, cfg, n_points=0, S=0) -> bool:
        """Whether the semantic-head acts fast path covers this call.

        ``n_points`` (n_rays * n_samples) applies the same activation-HBM cap
        as the rgb acts path: a differentiated batch beyond the byte budget
        (fused_mlp_t.acts_points_cap — ~2.8KB/point at D=4/W=256, ~4.9KB at
        the reference-default D=8) would OOM HBM, so it falls back to Flax.
        With ``S`` (samples per ray) given, the cap is checked at the count
        the kernel actually materializes after its LCM ray padding.
        """
        from depth_lidar_nerf_tpu.ops import fused_mlp, fused_mlp_t

        if (jax.default_backend() not in ("tpu", "axon")
                and not fused_mlp.interpret_mode()):
            return False
        if n_points and S:
            n_points = fused_mlp_t.semantic_padded_rays(
                -(-n_points // S), S, self.module.depth, self.module.width,
                self.module.dtype) * S
        if n_points > fused_mlp_t.acts_points_cap(
                self.module.depth, self.module.width, self.module.dtype):
            return False
        return fused_mlp_t.supports_semantic(
            params, self.module.use_viewdirs, self.module.depth,
            self.module.width, cfg.multires, cfg.multires_views,
            skips=self.module.skips)

    def apply_rays_semantic(self, params, rays, z_vals, cfg):
        """Semantic fast path: (raw [4, N, S], semantic logits [N, S, C])."""
        from depth_lidar_nerf_tpu.ops import fused_mlp_t

        return fused_mlp_t.fused_nerf_apply_rays_semantic(
            params, rays.origins, rays.directions, rays.viewdirs, z_vals,
            depth=self.module.depth, width=self.module.width,
            multires=cfg.multires, multires_views=cfg.multires_views,
            dtype=self.module.dtype, mesh=self.mesh,
            skips=self.module.skips)

    def apply_rays(self, params, rays, z_vals, cfg, fwd_cull=None,
                   save_acts=False):
        """Transposed fast path (v4): rays + per-ray depths -> raw."""
        from depth_lidar_nerf_tpu.ops import fused_mlp_t

        # DLNERF_NO_BWD_CULL=1 disables the cotangent-culled backward even
        # when cull_eps > 0 — a measurement knob that isolates how much of
        # the strict-math (cull_eps=0) penalty is the lost backward cull vs
        # the compositing mask itself (PERF.md "strict-math accounting").
        cull_bwd = (cfg.cull_eps > 0
                    and os.environ.get("DLNERF_NO_BWD_CULL", "0") != "1")
        return fused_mlp_t.fused_nerf_apply_rays(
            params, rays.origins, rays.directions, rays.viewdirs, z_vals,
            depth=self.module.depth, width=self.module.width,
            multires=cfg.multires, multires_views=cfg.multires_views,
            dtype=self.module.dtype, cull_bwd=cull_bwd,
            fwd_cull=fwd_cull, save_acts=save_acts, mesh=self.mesh,
            skips=self.module.skips)

    def apply_rays_q8(self, params, rays, z_vals, cfg):
        """Quantized (W8A8) serving forward — eval renders only, no VJP."""
        from depth_lidar_nerf_tpu.ops import fused_mlp_t

        return fused_mlp_t.fused_nerf_apply_rays_q8(
            params, rays.origins, rays.directions, rays.viewdirs, z_vals,
            depth=self.module.depth, width=self.module.width,
            multires=cfg.multires, multires_views=cfg.multires_views,
            dtype=self.module.dtype, mesh=self.mesh,
            skips=self.module.skips)

    def apply_rays_semantic_q8(self, params, rays, z_vals, cfg):
        """Quantized semantic serving forward — eval renders only, no VJP."""
        from depth_lidar_nerf_tpu.ops import fused_mlp_t

        return fused_mlp_t.fused_nerf_apply_rays_semantic_q8(
            params, rays.origins, rays.directions, rays.viewdirs, z_vals,
            depth=self.module.depth, width=self.module.width,
            multires=cfg.multires, multires_views=cfg.multires_views,
            dtype=self.module.dtype, mesh=self.mesh,
            skips=self.module.skips)


class FrozenAlphaMLP:
    """The NeRF_RGB variant (run_nerf_helpers.py:176-260): density comes from
    a frozen pretrained alpha model under stop_gradient; only the color branch
    trains."""

    def __init__(self, module: NeRFMLP, alpha_module, alpha_params):
        self.module = module
        self.dtype = module.dtype
        self.alpha_module = alpha_module
        self.alpha_params = alpha_params

    def init(self, *args, **kwargs):
        return self.module.init(*args, **kwargs)

    def apply(self, params, pts_embed, views_embed=None, frozen_sigma=None):
        raw_a = self.alpha_module.apply(self.alpha_params, pts_embed, views_embed)
        fs = jax.lax.stop_gradient(raw_a[..., 3:4])
        return self.module.apply(params, pts_embed, views_embed, frozen_sigma=fs)


class FrozenModel:
    """A fully frozen field (the --no_coarse path, run_nerf.py:417-419,
    606-616): the coarse sampling pass queries the pretrained alpha model and
    nothing in it trains."""

    def __init__(self, module, frozen_params):
        self.module = module
        self.dtype = getattr(module, "dtype", None)
        self.frozen_params = frozen_params

    def init(self, *args, **kwargs):
        # Keep a (tiny, unused) param tree so the optimizer state stays valid.
        return self.module.init(*args, **kwargs)

    def apply(self, params, pts_embed, views_embed=None, frozen_sigma=None):
        del params
        return jax.lax.stop_gradient(
            self.module.apply(self.frozen_params, pts_embed, views_embed))


class Models(NamedTuple):
    """Static module bundle (hashable; safe to close over in jitted factories)."""

    coarse: NeRFMLP
    fine: Optional[NeRFMLP]
    discriminator: Optional[ESRDiscriminator]
    vgg: Optional[VGG19Features]
    lpips: Optional[Any] = None  # train-time LPIPS feature loss (run_nerf.py:1242)


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray  # int32 scalar
    params: Any  # {"coarse": ..., "fine": ...}
    opt_state: Any
    disc_params: Any = None
    disc_opt_state: Any = None


def lr_schedule(cfg: TrainConfig):
    decay_steps = cfg.lrate_decay * 1000
    return lambda step: cfg.lrate * (0.1 ** (step / decay_steps))


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.adam(learning_rate=lr_schedule(cfg), b1=0.9, b2=0.999, eps=1e-8)


def make_disc_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.adam(learning_rate=cfg.gan_disc_lrate, b1=0.9, b2=0.999, eps=1e-8)


def build_models(cfg: TrainConfig, rcfg: RenderConfig) -> Models:
    pts_dim = embedding_dim(3, rcfg.multires)
    views_dim = embedding_dim(3, rcfg.multires_views) if cfg.use_viewdirs else 0
    num_sem = rcfg.num_semantic_classes
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    output_ch = 5 if cfg.N_importance > 0 else 4  # run_nerf.py:398

    coarse = NeRFMLP(
        depth=cfg.netdepth, width=cfg.netwidth, in_channels=pts_dim,
        in_channels_views=views_dim, use_viewdirs=cfg.use_viewdirs,
        num_semantic_classes=num_sem, output_ch=output_ch, dtype=dtype,
    )
    fine = None
    if cfg.N_importance > 0:
        fine = NeRFMLP(
            depth=cfg.netdepth_fine, width=cfg.netwidth_fine, in_channels=pts_dim,
            in_channels_views=views_dim, use_viewdirs=cfg.use_viewdirs,
            num_semantic_classes=num_sem, output_ch=output_ch, dtype=dtype,
        )
    disc = ESRDiscriminator() if cfg.gan_loss else None
    vgg = None
    lpips_mod = None
    if cfg.feature_loss and cfg.feature_loss_type == "vgg":
        vgg = VGG19Features(taps=tuple(cfg.vgg_layers or ("conv1_2", "conv2_2")))
    elif cfg.feature_loss and cfg.feature_loss_type == "lpips":
        # --feature_loss_type lpips (run_nerf.py:1240-1246): LPIPS distance
        # replaces the VGG content loss; spatial maps logged when asked.
        from depth_lidar_nerf_tpu.models.lpips import LPIPS

        lpips_mod = LPIPS(spatial=cfg.lpips_spatial,
                          backbone=cfg.lpips_backbone)

    if cfg.alpha_model_path:
        # create_nerf's alpha-model branch (run_nerf.py:400-431): load the
        # pretrained fine network as the frozen density field.
        alpha_module = NeRFMLP(
            depth=cfg.netdepth_fine, width=cfg.netwidth_fine, in_channels=pts_dim,
            in_channels_views=views_dim, use_viewdirs=cfg.use_viewdirs,
            output_ch=output_ch, dtype=dtype,
        )
        alpha_params = load_alpha_params(cfg, alpha_module)
        if cfg.no_coarse:
            coarse = FrozenModel(alpha_module, alpha_params)
        else:
            coarse = FrozenAlphaMLP(coarse, alpha_module, alpha_params)
        if fine is not None:
            fine = FrozenAlphaMLP(fine, alpha_module, alpha_params)
        return Models(coarse, fine, disc, vgg, lpips_mod)
    if cfg.use_fused_mlp:
        if cfg.mesh_shape and len(cfg.mesh_shape) == 2 and cfg.mesh_shape[1] > 1:
            raise ValueError(
                "use_fused_mlp with a model-TP mesh (mesh_shape=[dp, tp], "
                "tp > 1) is unsupported; the Pallas kernels are per-device. "
                "Use the Flax path for tensor parallelism.")
        mesh = None
        if cfg.mesh_shape and _mesh_size(cfg.mesh_shape) > 1:
            # Multi-chip: the fused kernels run per-shard under shard_map
            # (GSPMD cannot partition pallas_call, so the ray axis is split
            # manually; see FusedMLP / fused_nerf_apply_rays).
            from depth_lidar_nerf_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(cfg.mesh_shape)
        coarse = FusedMLP(coarse, mesh=mesh)
        fine = FusedMLP(fine, mesh=mesh) if fine is not None else None
    return Models(coarse, fine, disc, vgg, lpips_mod)


def _mesh_size(shape):
    n = 1
    for s in shape:
        n *= s
    return n


def load_alpha_params(cfg: TrainConfig, alpha_module: NeRFMLP):
    """Load the frozen alpha model's params from an orbax checkpoint dir
    (the fine network's tree, mirroring run_nerf.py:410-411)."""
    import orbax.checkpoint as ocp

    pts_dim = embedding_dim(3, cfg.multires if cfg.i_embed != -1 else 0)
    views_dim = (embedding_dim(3, cfg.multires_views)
                 if cfg.use_viewdirs and cfg.i_embed != -1 else 0)
    pe = jnp.zeros((1, pts_dim))
    ve = jnp.zeros((1, views_dim)) if cfg.use_viewdirs else None
    template = alpha_module.init(jax.random.key(0), pe, ve)

    import os

    path = cfg.alpha_model_path
    # CheckpointManager lays out <dir>/<step>/default/; accept either level.
    if os.path.isdir(os.path.join(path, "default")):
        path = os.path.join(path, "default")
    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(path)
    # Accept either a bare param tree or a full TrainState-like dict.
    if (isinstance(restored, dict)
            and isinstance(restored.get("params"), dict)
            and "fine" in restored["params"]):
        tree = restored["params"]["fine"]
    elif isinstance(restored, dict) and "fine" in restored:
        tree = restored["fine"]
    else:
        tree = restored
    # Shape-check against the template.
    jax.tree.map(lambda a, b: None, template, tree)
    return jax.tree.map(jnp.asarray, tree)


def init_train_state(cfg: TrainConfig, rcfg: RenderConfig, models: Models,
                     rng: jax.Array) -> TrainState:
    pts_dim = embedding_dim(3, rcfg.multires)
    views_dim = embedding_dim(3, rcfg.multires_views) if cfg.use_viewdirs else 0
    pe = jnp.zeros((1, pts_dim), jnp.float32)
    ve = jnp.zeros((1, views_dim), jnp.float32) if cfg.use_viewdirs else None

    k_c, k_f, k_d = jax.random.split(rng, 3)
    params = {"coarse": models.coarse.init(k_c, pe, ve)}
    params["fine"] = models.fine.init(k_f, pe, ve) if models.fine is not None else None

    opt_state = make_optimizer(cfg).init(params)

    disc_params = disc_opt_state = None
    if models.discriminator is not None:
        disc_params = models.discriminator.init(
            k_d, jnp.zeros((1, cfg.nH, cfg.nW, 3), jnp.float32)
        )
        disc_opt_state = make_disc_optimizer(cfg).init(disc_params)

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        disc_params=disc_params,
        disc_opt_state=disc_opt_state,
    )


def init_vgg_params(cfg: TrainConfig, models: Models, rng: jax.Array):
    """Frozen perceptual-model parameters (not part of the optimized state).

    VGG: loads a converted torchvision state_dict from ``<datadir>/vgg19.pth``
    or ``$VGG19_TORCH_WEIGHTS`` when present; otherwise fixed-seed init.
    LPIPS (``feature_loss_type=lpips``): loads a torch ``lpips`` state_dict
    from ``$LPIPS_TORCH_WEIGHTS`` / ``<datadir>/lpips_alex.pth`` likewise.
    """
    import os

    if models.lpips is not None:
        from depth_lidar_nerf_tpu.models.lpips import (abs_lin_heads,
                                                       load_torch_lpips)

        x = jnp.zeros((1, cfg.nH, cfg.nW, 3), jnp.float32)
        params = models.lpips.init(rng, x, x)
        for cand in (os.environ.get("LPIPS_TORCH_WEIGHTS"),
                     os.path.join(cfg.datadir,
                                  f"lpips_{cfg.lpips_backbone}.pth")):
            if cand and os.path.exists(cand):
                from depth_lidar_nerf_tpu.utils.torch_weights import (
                    load_state_dict)

                params = load_torch_lpips(params, load_state_dict(cand),
                                          backbone=cfg.lpips_backbone)
                break
        # Lin heads only — a whole-tree abs would strip the backbone conv
        # weights' signs (matching init_lpips, models/lpips.py).
        return abs_lin_heads(params)
    if models.vgg is None:
        return None
    params = models.vgg.init(rng, jnp.zeros((1, cfg.nH, cfg.nW, 3), jnp.float32))
    for cand in (os.environ.get("VGG19_TORCH_WEIGHTS"),
                 os.path.join(cfg.datadir, "vgg19.pth")):
        if cand and os.path.exists(cand):
            from depth_lidar_nerf_tpu.models.vgg import load_torch_vgg19
            from depth_lidar_nerf_tpu.utils.torch_weights import load_state_dict

            return load_torch_vgg19(params, load_state_dict(cand))
    return params
