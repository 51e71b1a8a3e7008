"""config[0]: feature extraction — the fp32-parity entry point.

Extracts log-mel/MFCC/CMVN features for a corpus through the fused batched
front end; optionally checks parity against the in-repo NumPy oracle and
dumps features to .npz.
"""

from __future__ import annotations

import argparse

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from cli.common import add_corpus_args, add_run_args, load_corpus, make_logger
from mogasr.config import BatchConfig, FrontendConfig
from mogasr.pipeline import featurize
from mogasr.utils.metrics import Timer


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_corpus_args(p)
    add_run_args(p)
    p.add_argument("--out", help="write features to this .npz")
    p.add_argument("--write-ark", help="write features as a Kaldi text "
                                       "archive (ark,t) to this path")
    p.add_argument("--check-parity", action="store_true",
                   help="compare vs the NumPy oracle (fp32 tolerance)")
    p.add_argument("--feature-type", default="mfcc",
                   choices=["mfcc", "fbank", "plp"])
    p.add_argument("--add-pitch", action="store_true",
                   help="append the pitch triple (POV, centered log-f0, "
                        "delta log-f0) per frame — NCCF + on-device Viterbi "
                        "lag tracking (mogasr.frontend.pitch); parity "
                        "checking still covers the spectral dims")
    args = p.parse_args()

    corpus, _lex = load_corpus(args)
    fcfg = FrontendConfig(feature_type=args.feature_type,
                          add_pitch=args.add_pitch)
    bcfg = BatchConfig()
    logger = make_logger(args)

    with Timer() as t:
        batches = featurize(corpus, fcfg, bcfg)
    n_frames_total = int(sum(np.asarray(fb.n_frames).sum() for fb in batches))
    audio_sec = sum(len(w) for _, w, _ in corpus) / fcfg.sample_rate
    logger.log({
        "stage": "features", "utts": len(corpus), "frames": n_frames_total,
        "wall_sec": t.seconds, "rtf": t.seconds / max(audio_sec, 1e-9),
    })

    if args.check_parity:
        from mogasr.frontend.numpy_ref import extract_features_np

        worst = 0.0
        by_id = {u: (w, ws) for u, w, ws in corpus}
        for fb in batches:
            feats = np.asarray(fb.feats)
            nf = np.asarray(fb.n_frames)
            for i, utt_id in enumerate(fb.utt_ids):
                ref = extract_features_np(by_id[utt_id][0], fcfg)
                err = float(
                    np.abs(feats[i, : nf[i], : ref.shape[1]] - ref).max()
                )
                worst = max(worst, err)
        logger.log({"stage": "parity", "max_abs_err": worst, "pass": worst < 2e-3})

    if args.out or args.write_ark:
        dump = {}
        for fb in batches:
            feats = np.asarray(fb.feats)
            nf = np.asarray(fb.n_frames)
            for i, utt_id in enumerate(fb.utt_ids):
                dump[utt_id] = feats[i, : nf[i]]
        if args.out:
            np.savez_compressed(args.out, **dump)
            print(f"wrote {len(dump)} utterances to {args.out}")
        if args.write_ark:
            from mogasr.data.kaldi_io import write_ark_t

            write_ark_t(args.write_ark, sorted(dump.items()))
            print(f"wrote {len(dump)} utterances to {args.write_ark} (ark,t)")


if __name__ == "__main__":
    main()
