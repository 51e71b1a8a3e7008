"""Microbenchmark: GMM scoring kernel (config[1]) — TPU Pallas vs XLA vs CPU.

Establishes the CPU baseline BASELINE.md calls for (the reference publishes
none): single-core NumPy/BLAS GEMM-form scorer vs the fused TPU kernel at the
headline 256 comps x 1000 states scale. Run on the TPU box:

    python benchmarks/bench_gmm.py [--frames 8192] [--cpu-frames 1024]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> None:
    sys.path.insert(0, ".")
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=8192)
    p.add_argument("--cpu-frames", type=int, default=512)
    p.add_argument("--states", type=int, default=1000)
    p.add_argument("--components", type=int, default=256)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mogasr.am import gmm as G
    from mogasr.am.gmm_pallas import gmm_loglik_pallas

    rng = np.random.default_rng(0)
    S, K, D, N = args.states, args.components, 39, args.frames
    w = rng.dirichlet(np.ones(K), size=S).astype(np.float32)
    mu = rng.standard_normal((S, K, D)).astype(np.float32)
    var = (0.5 + rng.random((S, K, D))).astype(np.float32)
    g = G.GmmSet(jnp.asarray(w), jnp.asarray(mu), jnp.asarray(var))
    x = rng.standard_normal((N, D)).astype(np.float32)
    xj = jnp.asarray(x)
    flops = 2 * N * (2 * D) * S * K  # useful flops (unpadded reduction dim)

    results = {}
    for name, fn in [
        ("pallas_f32", jax.jit(lambda a: gmm_loglik_pallas(a, g, compute_dtype="float32"))),
        ("pallas_bf16", jax.jit(lambda a: gmm_loglik_pallas(a, g, compute_dtype="bfloat16"))),
        ("xla_chunked_f32", jax.jit(lambda a: G.gmm_loglik(a, g, state_chunk=125))),
    ]:
        fn(xj).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(3):
            fn(xj).block_until_ready()
        dt = (time.perf_counter() - t0) / 3
        results[name] = {
            "ms": round(dt * 1e3, 2),
            "useful_gflops": round(flops / dt / 1e9, 1),
            "frames_per_sec": round(N / dt),
        }

    Nc = args.cpu_frames
    t0 = time.perf_counter()
    G.gmm_loglik_np_gemm(x[:Nc], w, mu, var)
    cpu_dt = (time.perf_counter() - t0) * (N / Nc)
    results["cpu_numpy_gemm"] = {
        "ms": round(cpu_dt * 1e3, 1),
        "useful_gflops": round(flops / cpu_dt / 1e9, 2),
        "frames_per_sec": round(N / cpu_dt, 2),
    }
    results["speedup_pallas_f32_vs_cpu"] = round(
        cpu_dt / (results["pallas_f32"]["ms"] / 1e3), 1
    )
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
