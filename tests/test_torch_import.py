"""Reference-checkpoint migration: torch ``.tar`` -> TrainState.

Builds the reference ``NeRF`` topology (``run_nerf_helpers.py:77-174``) in raw
torch with random weights, saves a reference-format checkpoint dict
(``run_nerf.py:1872-1883``), imports it through
``train.torch_import.import_reference_checkpoint``, and asserts the Flax
forward reproduces the torch forward on identical embedded inputs — including
the default D=8/skip@4 topology and the semantic head. Also pins the
ESRDiscriminator classifier's flatten-order permutation (NCHW vs NHWC).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


class _TorchNeRF(torch.nn.Module):
    """Reference NeRF semantics with reference state_dict key names."""

    def __init__(self, D=8, W=256, input_ch=63, input_ch_views=27,
                 skips=(4,), num_classes=0):
        super().__init__()
        nn = torch.nn
        self.D, self.skips = D, tuple(skips)
        self.input_ch, self.input_ch_views = input_ch, input_ch_views
        self.pts_linears = nn.ModuleList(
            [nn.Linear(input_ch, W)]
            + [nn.Linear(W + (input_ch if i in self.skips else 0), W)
               for i in range(D - 1)])
        self.views_linears = nn.ModuleList([nn.Linear(input_ch_views + W, W // 2)])
        self.feature_linear = nn.Linear(W, W)
        self.alpha_linear = nn.Linear(W, 1)
        self.rgb_linear = nn.Linear(W // 2, 3)
        self.semantic_linear = (
            torch.nn.Sequential(nn.Linear(W, W // 2), nn.Linear(W // 2, num_classes))
            if num_classes else None)

    def forward(self, pts, views):
        h = pts
        for i, layer in enumerate(self.pts_linears):
            h = torch.relu(layer(h))
            if i in self.skips:
                h = torch.cat([pts, h], -1)
        alpha = self.alpha_linear(h)
        feature = self.feature_linear(h)
        sem = self.semantic_linear(feature) if self.semantic_linear else None
        h = torch.cat([feature, views], -1)
        h = torch.relu(self.views_linears[0](h))
        rgb = self.rgb_linear(h)
        out = torch.cat([rgb, alpha], -1)
        if sem is not None:
            out = torch.cat([out, sem], -1)
        return out


def _rand_init(model, seed):
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.3)
    return model.eval()


@pytest.mark.parametrize("depth,skips,classes", [(8, (4,), 0), (4, (4,), 5)])
def test_import_reference_checkpoint_matches_torch(tmp_path, depth, skips,
                                                   classes):
    import jax
    import jax.numpy as jnp

    from depth_lidar_nerf_tpu.models.nerf_mlp import NeRFMLP
    from depth_lidar_nerf_tpu.train.torch_import import (
        import_reference_checkpoint)

    W, IC, ICV = 64, 21, 9
    coarse_t = _rand_init(_TorchNeRF(depth, W, IC, ICV, skips, classes), 0)
    fine_t = _rand_init(_TorchNeRF(depth, W, IC, ICV, skips, classes), 1)
    ckpt = {
        "global_step": 12345,
        "network_fn_state_dict": coarse_t.state_dict(),
        "network_fine_state_dict": fine_t.state_dict(),
        "optimizer_state_dict": {},
    }
    tar = tmp_path / "012345.tar"
    torch.save(ckpt, str(tar))

    mk = lambda: NeRFMLP(depth=depth, width=W, in_channels=IC,  # noqa: E731
                         in_channels_views=ICV, skips=skips,
                         num_semantic_classes=classes)
    pe = jnp.zeros((1, IC))
    ve = jnp.zeros((1, ICV))
    params = {"coarse": mk().init(jax.random.key(0), pe, ve),
              "fine": mk().init(jax.random.key(1), pe, ve)}

    class S:  # minimal TrainState stand-in with .replace
        step = jnp.int32(0)
        disc_params = None

        def replace(self, **kw):
            for k, v in kw.items():
                setattr(self, k, v)
            return self

    s = S()
    s.params = params
    s = import_reference_checkpoint(str(tar), s)
    assert int(s.step) == 12345

    x = np.random.default_rng(2).normal(size=(17, IC)).astype(np.float32)
    v = np.random.default_rng(3).normal(size=(17, ICV)).astype(np.float32)
    for key, tm in (("coarse", coarse_t), ("fine", fine_t)):
        got = np.asarray(mk().apply(s.params[key], jnp.asarray(x), jnp.asarray(v)))
        with torch.no_grad():
            want = tm(torch.from_numpy(x), torch.from_numpy(v)).numpy()
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_import_discriminator_classifier_permutation(tmp_path):
    import jax
    import jax.numpy as jnp

    from depth_lidar_nerf_tpu.models.discriminator import ESRDiscriminator
    from depth_lidar_nerf_tpu.train.torch_import import (
        convert_esr_discriminator)
    from depth_lidar_nerf_tpu.utils.torch_weights import load_state_dict

    nn = torch.nn
    nH, nW = 12, 16

    class TD(nn.Module):
        def __init__(self):
            super().__init__()
            blocks = []
            cin = 3
            for cout in (16, 32):
                blocks += [nn.Conv2d(cin, cout, 3, 1, 1), nn.LeakyReLU(0.2),
                           nn.Conv2d(cout, cout, 3, 2, 1), nn.LeakyReLU(0.2)]
                cin = cout
            self.model = nn.Sequential(*blocks)
            self.classifier = nn.Sequential(
                nn.Linear(32 * (nH // 4) * (nW // 4), 1))

        def forward(self, img):
            return self.classifier(torch.flatten(self.model(img), 1))

    td = _rand_init(TD(), 4)
    pth = tmp_path / "disc.pth"
    torch.save(td.state_dict(), str(pth))

    x = np.random.default_rng(5).normal(size=(2, nH, nW, 3)).astype(np.float32)
    d = ESRDiscriminator()
    variables = d.init(jax.random.key(0), jnp.asarray(x))
    variables = convert_esr_discriminator(variables, load_state_dict(str(pth)),
                                          patch_hw=(nH, nW))
    got = np.asarray(d.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = td(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_import_adam_moments_match_torch(tmp_path):
    """Run a few real torch Adam steps on the reference model pair, import
    the optimizer_state_dict, and check optax's mu/nu/count equal torch's
    exp_avg/exp_avg_sq/step (weights transposed like the params)."""
    import jax
    import jax.numpy as jnp
    import optax

    from depth_lidar_nerf_tpu.models.nerf_mlp import NeRFMLP
    from depth_lidar_nerf_tpu.train.torch_import import (
        convert_nerf_state_dict, import_adam_state)

    W, IC, ICV = 32, 9, 6
    coarse_t = _rand_init(_TorchNeRF(2, W, IC, ICV, (4,), 0), 0)
    fine_t = _rand_init(_TorchNeRF(2, W, IC, ICV, (4,), 0), 1)
    opt_t = torch.optim.Adam(
        list(coarse_t.parameters()) + list(fine_t.parameters()), lr=1e-3,
        betas=(0.9, 0.999))
    torch.manual_seed(2)
    for _ in range(3):  # populate real moments
        opt_t.zero_grad()
        x = torch.randn(8, IC)
        v = torch.randn(8, ICV)
        (coarse_t(x, v).square().mean() + fine_t(x, v).square().mean()).backward()
        opt_t.step()

    ckpt = {"global_step": 3,
            "network_fn_state_dict": coarse_t.state_dict(),
            "network_fine_state_dict": fine_t.state_dict(),
            "optimizer_state_dict": opt_t.state_dict()}
    # Round-trip through torch.save to exercise the torch-free reader too.
    tar = tmp_path / "000003.tar"
    torch.save(ckpt, str(tar))
    from depth_lidar_nerf_tpu.utils.torch_weights import load_state_dict

    ckpt = load_state_dict(str(tar))

    mk = lambda: NeRFMLP(depth=2, width=W, in_channels=IC,  # noqa: E731
                         in_channels_views=ICV, skips=(4,))
    pe, ve = jnp.zeros((1, IC)), jnp.zeros((1, ICV))
    params = {"coarse": mk().init(jax.random.key(0), pe, ve),
              "fine": mk().init(jax.random.key(1), pe, ve)}
    params["coarse"] = convert_nerf_state_dict(
        params["coarse"], ckpt["network_fn_state_dict"])
    params["fine"] = convert_nerf_state_dict(
        params["fine"], ckpt["network_fine_state_dict"])

    optimizer = optax.adam(learning_rate=lambda s: 1e-3, b1=0.9, b2=0.999,
                           eps=1e-8)
    opt_state = import_adam_state(optimizer, params, ckpt, 3)
    assert opt_state is not None
    adam = next(s for s in opt_state if hasattr(s, "mu"))
    assert int(adam.count) == 3

    # Spot-check two layers per model against torch's per-param state.
    t_state = opt_t.state_dict()["state"]
    # coarse trunk_0.kernel == grad_vars[0] (pts_linears.0.weight, transposed)
    np.testing.assert_allclose(
        np.asarray(adam.mu["coarse"]["params"]["trunk_0"]["kernel"]),
        t_state[0]["exp_avg"].numpy().T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(adam.nu["coarse"]["params"]["rgb"]["bias"]),
        t_state[11]["exp_avg_sq"].numpy(), rtol=1e-6)
    # fine model offsets by the coarse param count (12 tensors for D=2)
    np.testing.assert_allclose(
        np.asarray(adam.mu["fine"]["params"]["sigma"]["kernel"]),
        t_state[12 + 8]["exp_avg"].numpy().T, rtol=1e-6)


def test_export_roundtrip_and_torch_loadable(tmp_path):
    """export_reference_checkpoint must produce a .tar the reference's own
    resume path can consume (torch load_state_dict on the key names) and
    that round-trips through import_reference_checkpoint bit-for-bit."""
    import jax
    import jax.numpy as jnp

    from depth_lidar_nerf_tpu.models.nerf_mlp import NeRFMLP
    from depth_lidar_nerf_tpu.train.torch_import import (
        export_reference_checkpoint, import_reference_checkpoint)

    W, IC, ICV = 48, 15, 9
    mk = lambda: NeRFMLP(depth=3, width=W, in_channels=IC,  # noqa: E731
                         in_channels_views=ICV, skips=(1,))
    pe, ve = jnp.zeros((1, IC)), jnp.zeros((1, ICV))
    params = {"coarse": mk().init(jax.random.key(0), pe, ve),
              "fine": mk().init(jax.random.key(1), pe, ve)}

    class S:
        step = jnp.int32(77)
        disc_params = None

        def replace(self, **kw):
            for k, v in kw.items():
                setattr(self, k, v)
            return self

    s = S()
    s.params = params
    tar = str(tmp_path / "000077.tar")
    export_reference_checkpoint(s, tar)

    # The reference's torch model must load it strictly (all keys match).
    tm = _TorchNeRF(3, W, IC, ICV, (1,), 0)
    ckpt = torch.load(tar, map_location="cpu", weights_only=True)
    assert ckpt["global_step"] == 77
    tm.load_state_dict(ckpt["network_fn_state_dict"], strict=True)
    tm.load_state_dict(ckpt["network_fine_state_dict"], strict=True)

    # Round trip back into a fresh state: params identical bit-for-bit.
    s2 = S()
    s2.params = {"coarse": mk().init(jax.random.key(5), pe, ve),
                 "fine": mk().init(jax.random.key(6), pe, ve)}
    s2 = import_reference_checkpoint(tar, s2)
    assert int(s2.step) == 77
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_import_export_coarse_only_model(tmp_path):
    """N_importance=0 models: TrainState.params carries fine=None; both
    import and export must treat that as 'no fine network' (the reference
    saves network_fine_state_dict=None for such runs, run_nerf.py:1877)."""
    import jax
    import jax.numpy as jnp

    from depth_lidar_nerf_tpu.models.nerf_mlp import NeRFMLP
    from depth_lidar_nerf_tpu.train.torch_import import (
        export_reference_checkpoint, import_reference_checkpoint)

    W, IC, ICV = 32, 9, 6
    mk = lambda: NeRFMLP(depth=2, width=W, in_channels=IC,  # noqa: E731
                         in_channels_views=ICV, skips=())
    pe, ve = jnp.zeros((1, IC)), jnp.zeros((1, ICV))

    class S:
        step = jnp.int32(5)
        disc_params = None

        def replace(self, **kw):
            for k, v in kw.items():
                setattr(self, k, v)
            return self

    s = S()
    s.params = {"coarse": mk().init(jax.random.key(0), pe, ve), "fine": None}
    tar = str(tmp_path / "000005.tar")
    export_reference_checkpoint(s, tar)
    ck = torch.load(tar, map_location="cpu", weights_only=True)
    assert "network_fine_state_dict" not in ck

    s2 = S()
    s2.params = {"coarse": mk().init(jax.random.key(1), pe, ve), "fine": None}
    s2 = import_reference_checkpoint(tar, s2)
    assert int(s2.step) == 5
    assert s2.params["fine"] is None
    import numpy as _np

    for a, b in zip(jax.tree_util.tree_leaves(s.params),
                    jax.tree_util.tree_leaves(s2.params)):
        _np.testing.assert_array_equal(_np.asarray(a), _np.asarray(b))


def test_import_adam_moments_coarse_only(tmp_path):
    """Adam-moment import with params['fine']=None: the mu/nu trees must
    mirror the None leaf exactly — proven by running a real optax update
    on the imported state."""
    import jax
    import jax.numpy as jnp
    import optax

    from depth_lidar_nerf_tpu.models.nerf_mlp import NeRFMLP
    from depth_lidar_nerf_tpu.train.torch_import import import_adam_state

    W, IC, ICV = 32, 9, 6
    coarse_t = _rand_init(_TorchNeRF(2, W, IC, ICV, (), 0), 0)
    opt_t = torch.optim.Adam(coarse_t.parameters(), lr=1e-3)
    torch.manual_seed(3)
    for _ in range(2):
        opt_t.zero_grad()
        coarse_t(torch.randn(4, IC), torch.randn(4, ICV)).square().mean().backward()
        opt_t.step()

    ckpt = {"global_step": 2,
            "network_fn_state_dict": coarse_t.state_dict(),
            "optimizer_state_dict": opt_t.state_dict()}

    mk = lambda: NeRFMLP(depth=2, width=W, in_channels=IC,  # noqa: E731
                         in_channels_views=ICV, skips=())
    pe, ve = jnp.zeros((1, IC)), jnp.zeros((1, ICV))
    params = {"coarse": mk().init(jax.random.key(0), pe, ve), "fine": None}
    optimizer = optax.adam(learning_rate=1e-3)
    opt_state = import_adam_state(optimizer, params, ckpt, 2)
    assert opt_state is not None

    # Structure check: one real update with a grads tree shaped like params.
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = optimizer.update(grads, opt_state, params)
    assert updates["fine"] is None
    adam = next(s for s in opt_state if hasattr(s, "mu"))
    np.testing.assert_allclose(
        np.asarray(adam.mu["coarse"]["params"]["trunk_0"]["kernel"]),
        opt_t.state_dict()["state"][0]["exp_avg"].numpy().T, rtol=1e-6)


def test_import_disc_adam_moments_match_torch(tmp_path):
    """Discriminator Adam moments: the reference registers classifier
    BEFORE model (discriminator.py:49-55), so parameters() order is
    classifier-first — train a real torch Adam on the reference-ordered
    module and check the imported optax moments (incl. the conv OIHW->HWIO
    and classifier flatten permutations)."""
    import jax
    import jax.numpy as jnp
    import optax

    from depth_lidar_nerf_tpu.models.discriminator import ESRDiscriminator
    from depth_lidar_nerf_tpu.train.torch_import import import_disc_adam_state

    nn = torch.nn
    nH, nW = 12, 16

    class TD(nn.Module):
        def __init__(self):
            super().__init__()
            # reference attribute order: classifier BEFORE model
            self.classifier = nn.Sequential(
                nn.Linear(32 * (nH // 4) * (nW // 4), 1))
            blocks = []
            cin = 3
            for cout in (16, 32):
                blocks += [nn.Conv2d(cin, cout, 3, 1, 1), nn.LeakyReLU(0.2),
                           nn.Conv2d(cout, cout, 3, 2, 1), nn.LeakyReLU(0.2)]
                cin = cout
            self.model = nn.Sequential(*blocks)

        def forward(self, img):
            return self.classifier(torch.flatten(self.model(img), 1))

    td = _rand_init(TD(), 9)
    opt_t = torch.optim.Adam(td.parameters(), lr=5e-4, betas=(0.9, 0.999))
    torch.manual_seed(4)
    for _ in range(2):
        opt_t.zero_grad()
        td(torch.randn(2, 3, nH, nW)).square().mean().backward()
        opt_t.step()

    ckpt = {"discriminator_state_dict": td.state_dict(),
            "discriminator_optimizer_dict": opt_t.state_dict()}
    tar = tmp_path / "d.tar"
    torch.save(ckpt, str(tar))
    from depth_lidar_nerf_tpu.utils.torch_weights import load_state_dict

    ckpt = load_state_dict(str(tar))

    d = ESRDiscriminator()
    x = np.zeros((1, nH, nW, 3), np.float32)
    variables = d.init(jax.random.key(0), jnp.asarray(x))
    optimizer = optax.adam(learning_rate=5e-4, b1=0.9, b2=0.999, eps=1e-8)
    dstate = import_disc_adam_state(optimizer, variables, ckpt, 2,
                                    patch_hw=(nH, nW))
    assert dstate is not None
    adam = next(s for s in dstate if "mu" in getattr(type(s), "_fields", ()))
    assert int(adam.count) == 2

    t_state = opt_t.state_dict()["state"]
    # grad_vars[2] = model.0.weight (classifier's two tensors come first)
    np.testing.assert_allclose(
        np.asarray(adam.mu["params"]["block0_conv0"]["kernel"]),
        t_state[2]["exp_avg"].numpy().transpose(2, 3, 1, 0), rtol=1e-6)
    # classifier moment gets the same flatten permutation as the weight
    w = t_state[0]["exp_avg_sq"].numpy()  # [1, 32*h*w]
    h, w_ = nH // 4, nW // 4
    want = w.reshape(1, 32, h, w_).transpose(0, 2, 3, 1).reshape(1, -1).T
    np.testing.assert_allclose(
        np.asarray(adam.nu["params"]["classifier"]["kernel"]), want,
        rtol=1e-6)
    # structure check: a real update step works
    grads = jax.tree.map(jnp.ones_like, variables)
    optimizer.update(grads, dstate, variables)
