"""Isolated decoder-kernel A/B: XLA scan vs Pallas, Viterbi and FB.

Times the forward passes on bench-scale shapes (word-loop graph over the
synthetic lexicon, random emissions — decode speed is score-independent)
with the many-dispatch/one-sync methodology (docs/TPU_NOTES.md: per-op
timings under the ~30 ms tunnel dispatch floor are untrustworthy).  This
is the promotion gate for decoder/viterbi_pallas.py and
decoder/fb_pallas.py: a kernel beating its XLA row by >1.2x at (already
tested) equal decisions becomes the production default.

Writes benchmarks/results_decoder_kernels.json.

    python benchmarks/bench_decoder_kernels.py [--batch 64 --frames 600]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=600)
    ap.add_argument("--dispatches", type=int, default=20,
                    help="batches in flight per timed rep (one sync)")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from mogasr.config import TopologyConfig
    from mogasr.decoder import forward_backward as fbd
    from mogasr.decoder import viterbi as vit
    from mogasr.decoder.fb_pallas import forward_backward_pallas
    from mogasr.decoder.viterbi_pallas import viterbi_pallas
    from mogasr.hmm import graph as gr
    from mogasr.hmm.lexicon import synthetic_lexicon
    from mogasr.hmm.topology import build_topology

    lex = synthetic_lexicon()
    topo = build_topology(lex, TopologyConfig())
    tokens = [(w, lex.words_to_phone_ids([w])) for w in lex.words]
    g = gr.loop_graph(topo, tokens=tokens)
    B, T = args.batch, args.frames
    graphs = {k: jnp.asarray(v) for k, v in gr.batch_graphs([g] * B).items()}
    J = int(graphs["emit_id"].shape[1])
    rng = np.random.default_rng(0)
    n_frames = jnp.asarray(np.full(B, T, np.int32))
    emits = [jnp.asarray(rng.standard_normal((B, T, topo.n_pdfs))
                         .astype(np.float32))
             for _ in range(args.dispatches)]
    print(f"J={J} states, B={B}, T={T}, {args.dispatches} dispatches/rep",
          flush=True)

    contenders = [
        ("viterbi_xla", lambda e: vit.viterbi(e, graphs, n_frames).score),
        ("viterbi_pallas", lambda e: viterbi_pallas(e, graphs, n_frames).score),
        ("fb_xla", lambda e: fbd.forward_backward(e, graphs, n_frames).loglik),
        ("fb_pallas",
         lambda e: forward_backward_pallas(e, graphs, n_frames).loglik),
    ]
    rows = []
    for name, fn in contenders:
        try:
            jax.block_until_ready([fn(e) for e in emits[:1]])  # compile
            t0 = time.perf_counter()
            for _ in range(args.reps):
                jax.block_until_ready([fn(e) for e in emits])
            dt = (time.perf_counter() - t0) / args.reps
            frames_per_sec = args.dispatches * B * T / dt
            rows.append({"kernel": name,
                         "ms_per_batch": round(1e3 * dt / args.dispatches, 3),
                         "frames_per_sec": round(frames_per_sec)})
            print(f"  {name}: {rows[-1]}", flush=True)
        except Exception as e:  # Mosaic compile rejection is a RESULT here
            rows.append({"kernel": name, "error": str(e)[:300]})
            print(f"  {name}: FAILED {str(e)[:200]}", flush=True)

    out = {"batch": B, "frames": T, "n_graph_states": J,
           "dispatches": args.dispatches, "reps": args.reps,
           "backend": jax.default_backend(), "rows": rows}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results_decoder_kernels.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
