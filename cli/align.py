"""config[2]: monophone GMM-HMM forced alignment (features + scoring + decode
fused end-to-end). Writes per-frame pdf/phone alignments."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from cli.common import add_corpus_args, add_run_args, load_corpus, make_logger
from cli.score import load_or_random_gmm
from mogasr.config import BatchConfig, FrontendConfig, TopologyConfig
from mogasr.hmm.topology import build_topology
from mogasr.pipeline import align_batch, featurize
from mogasr.utils.metrics import Timer


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--add-pitch", action="store_true",
                   help="append the (POV, centered log-f0, delta log-f0) pitch "
                        "triple to the features (frontend/pitch.py) — must "
                        "match between training and decoding")
    add_corpus_args(p)
    add_run_args(p)
    p.add_argument("--gmm-ckpt", help="orbax GMM checkpoint dir")
    p.add_argument("--num-states", type=int, default=0, help="0 = topo pdfs")
    p.add_argument("--num-components", type=int, default=8)
    p.add_argument("--acoustic-scale", type=float, default=1.0)
    p.add_argument("--out", help="write alignments (jsonl)")
    args = p.parse_args()

    import jax

    corpus, lex = load_corpus(args)
    fcfg = FrontendConfig(add_pitch=args.add_pitch)
    topo = build_topology(lex, TopologyConfig())
    if args.num_states == 0:
        args.num_states = topo.n_pdfs
    logger = make_logger(args)
    batches = featurize(corpus, fcfg, BatchConfig())
    gmm = load_or_random_gmm(args, fcfg.feat_dim)
    pdf_to_phone = topo.pdf_to_phone()

    out_f = open(args.out, "w") if args.out else None
    audio_sec = sum(len(w) for _, w, _ in corpus) / fcfg.sample_rate
    with Timer() as t:
        for fb in batches:
            res, labels, _ = align_batch(fb, gmm, lex, topo, args.acoustic_scale)
            labels_np = np.asarray(labels)
            nf = np.asarray(fb.n_frames)
            if out_f:
                for i, utt_id in enumerate(fb.utt_ids):
                    pdfs = labels_np[i, : nf[i]].tolist()
                    phones = [lex.phones[pdf_to_phone[x]] for x in pdfs]
                    out_f.write(json.dumps({
                        "utt_id": utt_id, "pdfs": pdfs, "phones": phones,
                        "score": float(res.score[i]),
                    }) + "\n")
    if out_f:
        out_f.close()
    logger.log({
        "stage": "align", "utts": len(corpus), "wall_sec": t.seconds,
        "rtf": t.seconds / max(audio_sec, 1e-9),
    })


if __name__ == "__main__":
    main()
