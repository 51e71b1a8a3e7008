"""GMM-kernel steady-state sweep: mode x layout x kc, many-dispatch timing.

The trustworthy kernel-throughput harness (docs/TPU_NOTES.md: synchronized
per-call timings through the axon tunnel are garbage; only multi-second
many-dispatch sweeps measure real throughput).  Times the Pallas scorer at
the BASELINE.json configs[1] scale (1000 states x 256 comps x 39 dims) over
>= `--seconds` of device work per variant, reports useful TF/s (unpadded
contraction = 2*N*2D*S*K plus the K-reduction epilogue) and MFU against the
v5e bf16 peak.

MUST run alone on the box (no concurrent pytest/builds): dispatch is
host-driven and the host has one core.

    python benchmarks/bench_gmm_sweep.py [--modes sum,max] [--layouts chunked]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time


PEAK_TFLOPS_BF16 = 197.0


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=8192)
    p.add_argument("--states", type=int, default=1000)
    p.add_argument("--components", type=int, default=256)
    p.add_argument("--modes", default="sum,max")
    p.add_argument("--layouts", default="chunked")
    p.add_argument("--kcs", default="16")
    p.add_argument("--dtypes", default="bfloat16")
    p.add_argument("--seconds", type=float, default=4.0,
                   help="min measured wall seconds per variant")
    p.add_argument("--out", default=None, help="also write results JSON here")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mogasr.am.gmm import GmmSet
    from mogasr.am.gmm_pallas import gmm_loglik_pallas

    rng = np.random.default_rng(7)
    S, K, D, N = args.states, args.components, 39, args.frames
    g = GmmSet(
        jnp.asarray(rng.dirichlet(np.ones(K), size=S).astype(np.float32)),
        jnp.asarray(rng.standard_normal((S, K, D)).astype(np.float32)),
        jnp.asarray((0.5 + rng.random((S, K, D))).astype(np.float32)),
    )
    xs = [jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
          for _ in range(4)]

    variants = list(itertools.product(
        args.modes.split(","), args.layouts.split(","),
        # "d" = the production default (kc AND tiles resolved per
        # mode/dtype/size inside gmm_loglik_pallas — round-4 adaptive tiles)
        [None if k == "d" else int(k) for k in args.kcs.split(",")],
        args.dtypes.split(","),
    ))
    results = {"scale": f"{S}x{K}x{D}", "frames": N, "rows": []}
    for mode, layout, kc, dtype in variants:
        # Reduce each call's [N, S] output to a scalar ON DEVICE so holding
        # hundreds of in-flight dispatches costs bytes, not HBM gigabytes
        # (the first version kept 33 MB outputs live and hit
        # RESOURCE_EXHAUSTED during calibration). The reduction adds ~N*S
        # VPU adds per call — noise against the 2*N*2D*S*K kernel FLOPs.
        fn = jax.jit(lambda a, m=mode, l=layout, k=kc, d=dtype: gmm_loglik_pallas(
            a, g, compute_dtype=d, layout=l, mode=m, kc=k).sum())
        jax.block_until_ready([fn(x) for x in xs])  # compile + warm

        # calibrate dispatch count to reach --seconds of work
        n_disp, dt = 16, 0.0
        while True:
            t0 = time.perf_counter()
            outs = [fn(xs[i % len(xs)]) for i in range(n_disp)]
            jax.block_until_ready(outs)
            dt = time.perf_counter() - t0
            if dt >= args.seconds:
                break
            n_disp = min(
                max(n_disp + 1, int(n_disp * 1.6 * args.seconds / max(dt, 1e-3))),
                4096,
            )
        ep = 5 if mode == "sum" else 1  # VPU ops/gaussian in the epilogue
        useful = n_disp * N * (2 * (2 * D) * S * K + ep * S * K)
        tf = useful / dt / 1e12
        row = {
            "mode": mode, "layout": layout, "kc": kc, "dtype": dtype,
            "dispatches": n_disp, "wall_s": round(dt, 2),
            "tflops_useful": round(tf, 1),
            "mfu": round(tf / PEAK_TFLOPS_BF16, 4),
            "us_per_call": round(dt / n_disp * 1e6),
        }
        results["rows"].append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
