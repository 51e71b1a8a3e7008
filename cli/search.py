"""Keyword spotting: decode -> word lattices -> posterior term detection.

Searches every utterance for the given terms (comma-separated; multi-word
phrases use spaces) and writes JSONL hits with frame-level time spans and
posteriors. Built on the lattice/confusion-network toolchain — the device
does one LM-Viterbi lattice pass, term search is host-side.
"""

from __future__ import annotations

import argparse
import json

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from cli.common import add_corpus_args, add_run_args, load_corpus, make_logger
from cli.score import load_or_random_gmm
from mogasr.config import BatchConfig, DecodeConfig, FrontendConfig, TopologyConfig
from mogasr.hmm.topology import build_topology
from mogasr.pipeline import (
    decode_batch_lattices, featurize, score_batch, word_decode_graph,
)
from mogasr.utils.metrics import Timer


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_corpus_args(p)
    add_run_args(p)
    p.add_argument("--gmm-ckpt", help="orbax GMM checkpoint dir")
    p.add_argument("--num-states", type=int, default=0)
    p.add_argument("--num-components", type=int, default=8)
    p.add_argument("--ctc", action="store_true",
                   help="search with a CTC acoustic model (train_nn "
                        "--objective ctc ckpt via --nn-ckpt) through the "
                        "CTC-topology word graph")
    p.add_argument("--nn-ckpt", help="CTC checkpoint dir (with --ctc)")
    p.add_argument("--nn-arch", default="mlp",
                   choices=["mlp", "lstm", "blstm", "tdnn", "conformer"])
    p.add_argument("--nn-hidden", type=int, default=512)
    p.add_argument("--nn-layers", type=int, default=3)
    p.add_argument("--terms", required=True,
                   help="comma-separated terms; spaces make phrases "
                        "(e.g. 'cat,dog fish')")
    p.add_argument("--threshold", type=float, default=0.3,
                   help="posterior threshold for a hit")
    p.add_argument("--acoustic-scale", type=float, default=1.0)
    p.add_argument("--insertion-penalty", type=float, default=2.0)
    p.add_argument("--out", help="write hits (jsonl)")
    args = p.parse_args()

    corpus, lex = load_corpus(args)
    fcfg = FrontendConfig()
    topo = build_topology(lex, TopologyConfig())
    if args.num_states == 0:
        args.num_states = topo.n_pdfs
    dcfg = DecodeConfig(
        acoustic_scale=args.acoustic_scale,
        word_insertion_penalty=args.insertion_penalty,
    )
    logger = make_logger(args)
    batches = featurize(corpus, fcfg, BatchConfig())
    if args.ctc:
        import jax

        from mogasr.am.ctc import ctc_decode_graph, make_ctc_scorer
        from mogasr.am.neural import build_model
        from mogasr.am.train_nn import init_train_state
        from mogasr.config import TrainConfig
        from mogasr.utils.checkpoint import restore_checkpoint

        if not args.nn_ckpt:
            raise SystemExit("--ctc requires --nn-ckpt")
        tcfg = TrainConfig(nn_arch=args.nn_arch, nn_hidden=args.nn_hidden,
                           nn_layers=args.nn_layers)
        nn_model = build_model(args.nn_arch, lex.n_phones + 1, tcfg)
        template = {
            "params": init_train_state(
                nn_model, tcfg, fcfg.feat_dim, jax.random.key(0)
            ).params,
        }
        scorer = make_ctc_scorer(
            nn_model, restore_checkpoint(args.nn_ckpt, template)["params"]
        )
        graph = ctc_decode_graph(lex, dcfg)
        gmm = None
    else:
        scorer = None
        gmm = load_or_random_gmm(args, fcfg.feat_dim)
        graph = word_decode_graph(lex, topo, dcfg)

    from mogasr.decoder.kws import keyword_search
    from mogasr.lm.ngram import estimate_bigram

    terms = [t.strip().split() for t in args.terms.split(",") if t.strip()]
    transcripts = [fb.words[b] for fb in batches for b in range(fb.size)]
    lm = estimate_bigram(transcripts, sorted(set(graph.labels)))

    frame_shift_sec = fcfg.frame_shift_ms / 1000.0
    records = []
    n_hits = 0
    with Timer() as t:
        for fb in batches:
            scores = scorer(fb) if scorer is not None else score_batch(fb.feats, gmm)
            lats, _ = decode_batch_lattices(fb, scores, graph, lm, dcfg)
            for b in range(fb.size):
                hits = keyword_search(lats[b], lm, terms, threshold=args.threshold)
                n_hits += len(hits)
                records.append({
                    "utt_id": fb.utt_ids[b],
                    "hits": [
                        {
                            "term": h.term,
                            "start_sec": round(h.start * frame_shift_sec, 3),
                            "end_sec": round((h.end + 1) * frame_shift_sec, 3),
                            "posterior": round(h.posterior, 4),
                        }
                        for h in hits
                    ],
                })
    logger.log({
        "stage": "kws", "utts": len(records), "terms": len(terms),
        "hits": n_hits, "wall_sec": t.seconds,
    })
    if args.out:
        with open(args.out, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
    else:
        for r in records:
            print(json.dumps(r))


if __name__ == "__main__":
    main()
