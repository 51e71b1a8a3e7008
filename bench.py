"""Headline benchmark: full ASR inference pipeline throughput on one chip.

Measures BASELINE.json's judged metric — utterances/sec/chip and RTF for
front end + GMM scoring + frame-synchronous Viterbi word decode — at the
reference's headline scoring scale (256 components x 1000 states,
BASELINE.json configs[1]) on synthetic 16 kHz utterances (no LibriSpeech audio
exists in this environment; SURVEY.md §0/§6).

vs_baseline is the measured single-core CPU reference implementation (NumPy
front end + BLAS-GEMM GMM scorer + XLA-CPU Viterbi) on the same utterances —
the "CPU-reference throughput" denominator of the >=50x north-star target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Persist XLA/Pallas compiles across bench processes (verified to work in
# this environment, docs/TPU_NOTES.md): a warm cache turns the multi-minute
# Pallas kernel compiles into file reads. Must be set before jax imports.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

# A/B knob for the Pallas GMM kernel structure (chunked | wide); the driver
# runs the default. See mogasr/am/gmm_pallas.py and docs/TPU_NOTES.md.
GMM_LAYOUT = os.environ.get("MOGASR_GMM_LAYOUT", "chunked")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mogasr import pipeline as pipe
    from mogasr.am.gmm import GmmSet, gmm_loglik_np_gemm
    from mogasr.am.gmm_pallas import gmm_loglik_batched
    from mogasr.config import BatchConfig, DecodeConfig, FrontendConfig, TopologyConfig
    from mogasr.data.synthetic import make_corpus
    from mogasr.decoder import viterbi as vit
    from mogasr.frontend import numpy_ref as npref
    from mogasr.frontend.jax_frontend import cached_frontend
    from mogasr.hmm import graph as gr
    from mogasr.hmm.lexicon import synthetic_lexicon
    from mogasr.hmm.topology import build_topology

    fcfg = FrontendConfig()
    dcfg = DecodeConfig(acoustic_scale=0.1)
    lex = synthetic_lexicon()
    topo = build_topology(lex, TopologyConfig())

    # Headline acoustic-model scale (BASELINE.json configs[1]).
    S, K, D = 1000, 256, fcfg.feat_dim
    rng = np.random.default_rng(0)
    gmm = GmmSet(
        jnp.asarray(rng.dirichlet(np.ones(K), size=S).astype(np.float32)),
        jnp.asarray(rng.standard_normal((S, K, D)).astype(np.float32)),
        jnp.asarray((0.5 + rng.random((S, K, D))).astype(np.float32)),
    )

    # Corpus: 768 synthetic utterances, ~6-13 s each — large enough that the
    # measurement is steady-state throughput, not Python dispatch ramp-up
    # (measured ladder at B64: 256 -> 1294, 512 -> 1330-1452, 768 -> 1497
    # utt/s; host synthesis is ~3 s, so corpus size costs little). The
    # former blocker for larger corpora was the CPU-reference baseline
    # (~130 s/utterance at full length); it now times a frame-sliced prefix
    # and extrapolates per frame (both its stages are linear in frames).
    n_utts = 768
    utts = make_corpus(n_utts, words_per_utt=(8, 16), seed=1)
    audio_seconds = sum(len(u.wave) for u in utts) / fcfg.sample_rate

    # Measured A/B on this chip (same code, 3-rep means): 64utt/B16 578,
    # 128/B16 792, 128/B32 883, 256/B32 1005, 256/B64 1294, 512/B64 1452,
    # 512/B128 1370 (padding fragmentation) -> B=64 on 256 utts.
    B = 64
    bcfg = BatchConfig(batch_size=B, bucket_boundaries=(800, 1100, 1400))
    # Word-loop decode graph; emit ids live in the first n_pdfs of the S=1000
    # state space, matching how a monophone system embeds in a larger
    # inventory.
    graph = pipe.word_decode_graph(lex, topo, dcfg)
    graphs_np = gr.batch_graphs([graph] * B)

    def make_pipeline(compute_dtype: str):
        graphs = {k: jnp.asarray(v) for k, v in graphs_np.items()}

        def run(waves, num_samples, fe):
            feats, n_frames = fe(waves, num_samples)
            ll = gmm_loglik_batched(
                feats, gmm, compute_dtype=compute_dtype, layout=GMM_LAYOUT
            )
            res = vit.viterbi(
                ll, graphs, n_frames, acoustic_scale=dcfg.acoustic_scale
            )
            return res.path, res.score

        return run

    # Pre-batch on host.
    from mogasr.data.batching import make_batches

    batches = list(
        make_batches([(u.utt_id, u.wave, u.words) for u in utts], bcfg, fcfg)
    )
    prepared = [
        (
            jnp.asarray(b.waves),
            jnp.asarray(b.num_samples),
            cached_frontend(fcfg, b.waves.shape[1]),
        )
        for b in batches
    ]

    tpu_pipeline = make_pipeline("bfloat16")

    def run_all():
        outs = [tpu_pipeline(w, ns, fe) for (w, ns, fe) in prepared]
        jax.block_until_ready(outs)
        return outs

    run_all()  # compile + warm
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        run_all()
    tpu_dt = (time.perf_counter() - t0) / reps
    tpu_utts_per_sec = n_utts / tpu_dt
    tpu_rtf = tpu_dt / audio_seconds

    # ---- CPU reference baseline: frame-sliced, extrapolated by frame count.
    # Both stages are linear in frames (per-frame NumPy front end + GEMM
    # scoring; Viterbi scan), so per-frame cost on a prefix extrapolates
    # exactly; timing full utterances measured ~130 s/utt and dominated the
    # bench budget.
    cpu_frames = 300
    total_frames = sum(fcfg.num_frames(len(u.wave)) for u in utts)
    cpu_viterbi = jax.jit(
        lambda ll, graphs, nf: vit.viterbi(
            ll, graphs, nf, acoustic_scale=dcfg.acoustic_scale
        ),
        backend="cpu",
    )
    g1 = {k: jnp.asarray(v[:1]) for k, v in graphs_np.items()}
    w_np = np.asarray(gmm.weights)
    mu_np = np.asarray(gmm.means)
    var_np = np.asarray(gmm.vars)
    u0 = utts[0]
    wave_slice = u0.wave[: (cpu_frames - 1) * fcfg.frame_shift + fcfg.frame_length]

    def cpu_run():
        feats = npref.extract_features_np(wave_slice, fcfg)
        assert feats.shape[0] == cpu_frames, feats.shape
        ll = gmm_loglik_np_gemm(feats, w_np, mu_np, var_np)
        res = cpu_viterbi(
            jnp.asarray(ll[None]), g1, jnp.asarray([ll.shape[0]])
        )
        jax.block_until_ready(res)

    cpu_run()  # warm the viterbi compile for the timed shape
    t0 = time.perf_counter()
    cpu_run()
    cpu_dt_subset = time.perf_counter() - t0
    cpu_dt_full = cpu_dt_subset * (total_frames / cpu_frames)
    cpu_utts_per_sec = n_utts / cpu_dt_full

    print(
        json.dumps(
            {
                "metric": "pipeline_utterances_per_sec_per_chip",
                "value": round(tpu_utts_per_sec, 2),
                "unit": "utt/s/chip",
                "vs_baseline": round(tpu_utts_per_sec / cpu_utts_per_sec, 1),
                "rtf": round(tpu_rtf, 6),
                "audio_seconds": round(audio_seconds, 1),
                "cpu_utts_per_sec": round(cpu_utts_per_sec, 4),
                "gmm": f"{S}x{K}x{D}",
                "n_utts": n_utts,
            }
        )
    )


if __name__ == "__main__":
    main()
