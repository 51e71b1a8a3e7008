"""Scale demonstration: tied-triphone system on a larger synthetic corpus.

Trains monophone -> tied-triphone (target ~300 pdfs, K components via the
splitting schedule) on 256 utterances and reports held-out WER for monophone
vs CD, plus wall-clock per stage. Writes benchmarks/results_cd_scale.json.

    python benchmarks/demo_cd_scale.py [--cpu] [--train-utts 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--train-utts", type=int, default=256)
    p.add_argument("--test-utts", type=int, default=48)
    p.add_argument("--target-pdfs", type=int, default=300)
    p.add_argument("--components", type=int, default=4)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mogasr import pipeline as pipe
    from mogasr.config import (
        BatchConfig, DecodeConfig, FrontendConfig, GmmConfig, TopologyConfig, TrainConfig,
    )
    from mogasr.data.synthetic import make_corpus
    from mogasr.eval.wer import corpus_wer
    from mogasr.hmm import triphone as tri
    from mogasr.hmm.lexicon import synthetic_lexicon
    from mogasr.hmm.topology import build_topology

    fcfg = FrontendConfig()
    bcfg = BatchConfig(batch_size=16, bucket_boundaries=(250, 400))
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0)
    lex = synthetic_lexicon()
    topo = build_topology(lex, TopologyConfig())

    t0 = time.perf_counter()
    train = make_corpus(args.train_utts, words_per_utt=(2, 4), seed=100)
    test = make_corpus(args.test_utts, words_per_utt=(2, 4), seed=999)
    tb = pipe.featurize([(u.utt_id, u.wave, u.words) for u in train], fcfg, bcfg)
    eb = pipe.featurize([(u.utt_id, u.wave, u.words) for u in test], fcfg, bcfg)
    t_feat = time.perf_counter() - t0

    gcfg = GmmConfig(n_states=topo.n_pdfs, n_components=args.components, feat_dim=fcfg.feat_dim)
    t0 = time.perf_counter()
    mono, mono_hist = pipe.train_gmm(
        tb, lex, topo, gcfg, TrainConfig(num_em_iters=8), reestimate_transitions=False
    )
    t_mono = time.perf_counter() - t0

    t0 = time.perf_counter()
    tied, res = pipe.train_triphone(
        tb, lex, topo, gcfg, TrainConfig(num_em_iters=6), mono,
        target_pdfs=args.target_pdfs,
    )
    t_cd = time.perf_counter() - t0

    def wer_of(gmm, graph):
        refs, hyps = [], []
        for fb in eb:
            scores = pipe.score_batch(fb.feats, gmm)
            out = pipe.decode_batch(fb, scores, graph, dcfg)
            for b in range(fb.size):
                refs.append([w.lower() for w in fb.words[b]])
                hyps.append([w.lower() for w in out[b]])
        return corpus_wer(refs, hyps)[0]

    t0 = time.perf_counter()
    wer_mono = wer_of(mono, pipe.word_decode_graph(lex, topo, dcfg))
    wer_cd = wer_of(res.gmm, tri.word_loop_graph_cd(tied, insertion_penalty=dcfg.word_insertion_penalty))
    t_dec = time.perf_counter() - t0

    results = {
        "train_utts": args.train_utts,
        "test_utts": args.test_utts,
        "mono_pdfs": topo.n_pdfs,
        "tied_pdfs": tied.n_pdfs,
        "components": res.gmm.n_components,
        "mono_loglik_last": round(mono_hist[-1], 3),
        "cd_loglik_last": round(res.history[-1], 3),
        "heldout_wer_mono": round(wer_mono, 4),
        "heldout_wer_cd": round(wer_cd, 4),
        "wall_featurize_s": round(t_feat, 1),
        "wall_train_mono_s": round(t_mono, 1),
        "wall_train_cd_s": round(t_cd, 1),
        "wall_decode_both_s": round(t_dec, 1),
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results_cd_scale.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
