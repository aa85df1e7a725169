"""Unit tests for the K-step dispatch-batching block planner.

The driver batches K non-patch optimizer steps into one lax.scan dispatch
(PERF.md round 3: 42.5k -> ~327k rays/s at the reference's shipped
N_rand=1024, configs/fern_dsnerf.txt:6). Blocks must never cross a
loss-schedule variant switch or a logging/checkpoint boundary, and the set
of compiled block lengths must stay bounded (powers of two).

The trajectory-equality integration test lives in
test_train_e2e.py::test_k_step_batching_matches_unbatched.
"""

from depth_lidar_nerf_tpu.train.config import TrainConfig
from depth_lidar_nerf_tpu.train.loop import dispatch_block_len, dispatch_k_max


class _Plan:
    """Stub plan: patch variant on multiples of ``every``."""

    def __init__(self, every=0):
        self.every = every

    def variant_key(self, i):
        on = bool(self.every and i % self.every == 0)
        return (on, False, False, False)


def _cfg(**kw):
    base = dict(expname="t", basedir="/tmp", datadir="/tmp",
                N_rand=1024, N_iters=100000, i_print=100, i_weights=10000,
                i_testset=0, i_video=0, i_img=0)
    base.update(kw)
    return TrainConfig(**base)


def test_k_max_auto_targets_16k_rays():
    # K*N_rand should ride the ~16k-ray throughput sweet spot.
    assert dispatch_k_max(_cfg(N_rand=1024)) == 16
    assert dispatch_k_max(_cfg(N_rand=4096)) == 4
    assert dispatch_k_max(_cfg(N_rand=16384)) == 1
    # never more than 32 dispatches batched, never less than 1
    assert dispatch_k_max(_cfg(N_rand=64)) == 32
    assert dispatch_k_max(_cfg(N_rand=65536)) == 1
    # explicit override wins
    assert dispatch_k_max(_cfg(N_rand=1024, steps_per_dispatch=4)) == 4


def test_block_is_power_of_two_and_capped():
    cfg = _cfg()
    plan = _Plan()
    for i in (1, 3, 101, 777):
        k = dispatch_block_len(cfg, plan, i, plan.variant_key(i))
        assert k & (k - 1) == 0  # power of two
        assert 1 <= k <= 16


def test_patch_iteration_runs_alone():
    # A patch-variant iteration must dispatch solo (the patch step has its
    # own jitted function; scanning it is unsupported).
    cfg = _cfg()
    plan = _Plan(every=10)
    assert dispatch_block_len(cfg, plan, 10, plan.variant_key(10)) == 1
    # ...and a block starting just after a patch stops before the next one:
    # iters 11..19 -> 9 available -> snaps to 8.
    assert dispatch_block_len(cfg, plan, 11, plan.variant_key(11)) == 8


def test_block_never_crosses_print_boundary():
    # i_print=100: a block starting at 97 may only cover 97..100 (the
    # boundary iteration may END the block) -> 4.
    cfg = _cfg()
    plan = _Plan()
    assert dispatch_block_len(cfg, plan, 97, plan.variant_key(97)) == 4
    # starting at 100 the block ends immediately on the boundary
    assert dispatch_block_len(cfg, plan, 100, plan.variant_key(100)) == 1


def test_block_never_crosses_n_iters():
    cfg = _cfg(N_iters=1003)
    plan = _Plan()
    k = dispatch_block_len(cfg, plan, 1001, plan.variant_key(1001))
    assert 1001 + k - 1 <= 1003
    assert k == 2  # 1001..1003 is 3 iters -> snaps to 2


def test_batching_disabled():
    cfg = _cfg(steps_per_dispatch=1)
    plan = _Plan()
    assert dispatch_block_len(cfg, plan, 5, plan.variant_key(5)) == 1


# ----------------------------------------------------------- cycle fusion

def _cycle(cfg, plan, i):
    from depth_lidar_nerf_tpu.train.loop import cycle_span

    return cycle_span(cfg, plan, i, plan.variant_key(i), dispatch_k_max(cfg))


def test_cycle_span_covers_period_to_patch():
    # patch every 10: a block starting at 11 fuses 9 plain steps + the
    # patch iteration at 20 into one dispatch.
    cfg = _cfg()
    plan = _Plan(every=10)
    assert _cycle(cfg, plan, 11) == (9, (True, False, False, False))
    # starting mid-period still fuses up to the next patch iteration
    assert _cycle(cfg, plan, 15) == (5, (True, False, False, False))


def test_cycle_span_boundaries():
    cfg = _cfg()
    plan = _Plan(every=10)
    # starting AT a patch iteration: the variant switches at the very next
    # step, so the fused block is (1 patch step + 1 plain step)
    assert _cycle(cfg, plan, 10) == (1, (False, False, False, False))
    # i_print=100 at iteration 100 is also the patch iteration -> the
    # period ENDING on the boundary is fine
    assert _cycle(cfg, plan, 91) == (9, (True, False, False, False))
    # but a boundary strictly inside the plain prefix forbids fusion
    cfg2 = _cfg(i_print=95)
    assert _cycle(cfg2, plan, 91) is None
    # and a block may not START on a boundary (its events must run)
    cfg3 = _cfg(i_print=91)
    assert _cycle(cfg3, plan, 91) is None


def test_cycle_span_disabled_paths():
    plan = _Plan(every=10)
    # flag off
    assert _cycle(_cfg(cycle_dispatch=False), plan, 11) is None
    # k-batching off
    assert _cycle(_cfg(steps_per_dispatch=1), plan, 11) is None
    # no variant switch at all within the cap -> scan path, not cycle
    assert _cycle(_cfg(), _Plan(), 11) is None


class _GanPlan:
    """Stub of the GAN phase: gan on EVERY iteration, feature+smooth on
    multiples of ``every`` (run_nerf.py:1552-1554)."""

    def __init__(self, every=10):
        self.every = every

    def variant_key(self, i):
        full = bool(i % self.every == 0)
        return (full, True, full, False)


def test_cycle_span_fuses_gan_phase():
    # prefix = 9 gan-only patch steps, tail = the gan+feature+smooth
    # iteration; both are patch variants (round-5 generalization).
    cfg = _cfg(gan_loss=True)
    plan = _GanPlan(every=10)
    assert _cycle(cfg, plan, 11) == (9, (True, True, True, False))
    assert _cycle(cfg, plan, 15) == (5, (True, True, True, False))
    # a tail differing in precrop/grid flags is NOT fusable
    class _P2(_GanPlan):
        def variant_key(self, i):
            k = super().variant_key(i)
            return k[:3] + (i % self.every == 0,)
    assert _cycle(cfg, _P2(every=10), 11) is None


def test_patch_variant_k_blocks():
    # a uniform patch phase with no upcoming switch forms K-scan blocks
    # (the in-jit sampler makes patch bodies scannable)
    cfg = _cfg(gan_loss=True)

    class _GanOnly:
        def variant_key(self, i):
            return (False, True, False, False)

    k = dispatch_block_len(cfg, _GanOnly(), 11, (False, True, False, False))
    assert k & (k - 1) == 0 and k > 1
