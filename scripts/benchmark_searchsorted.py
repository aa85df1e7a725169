"""searchsorted / sample_pdf micro-benchmark.

Parity: ``torchsearchsorted/examples/benchmark.py:7-71`` (B=5000, A=300,
V=100) — compares the numpy oracle, the native C++ kernel, the branchless
jnp formulation on the default device, and (on TPU) the fused Pallas
sample_pdf.
"""

from __future__ import annotations

import time
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import numpy as np


def main(B=5000, A=300, V=100, repeats=20):
    import jax
    import jax.numpy as jnp

    from depth_lidar_nerf_tpu.ops.native_searchsorted import searchsorted_native
    from depth_lidar_nerf_tpu.ops.sampling import searchsorted_right

    rng = np.random.default_rng(0)
    a = np.sort(rng.standard_normal((B, A)).astype(np.float32), -1)
    v = rng.standard_normal((B, V)).astype(np.float32)

    t0 = time.perf_counter()
    for _ in range(repeats):
        ref = np.stack([np.searchsorted(a[i], v[i], side="right")
                        for i in range(B)])
    t_np = (time.perf_counter() - t0) / repeats
    print(f"numpy per-row:  {t_np * 1e3:8.2f} ms")

    searchsorted_native(a[:4], v[:4], "right")  # warm the .so
    t0 = time.perf_counter()
    for _ in range(repeats):
        nat = searchsorted_native(a, v, "right")
    t_nat = (time.perf_counter() - t0) / repeats
    print(f"native C++:     {t_nat * 1e3:8.2f} ms")
    np.testing.assert_array_equal(nat, ref)

    aj, vj = jnp.asarray(a), jnp.asarray(v)
    f = jax.jit(searchsorted_right)
    out = f(aj, vj)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = f(aj, vj)
    out_host = np.asarray(out)  # honest barrier (host fetch)
    t_jax = (time.perf_counter() - t0) / repeats
    print(f"jnp branchless ({jax.default_backend()}): {t_jax * 1e3:8.2f} ms")
    np.testing.assert_array_equal(out_host, ref)


if __name__ == "__main__":
    main()
