"""config[1]: batched diagonal-GMM log-likelihood scoring benchmark/dump.

Scores padded feature batches against a GMM (checkpointed or random at the
headline 256x1000 scale) through the Pallas kernel; reports frames/sec.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from cli.common import add_corpus_args, add_run_args, load_corpus, make_logger
from mogasr.config import BatchConfig, FrontendConfig
from mogasr.pipeline import featurize, score_batch
from mogasr.utils.metrics import Timer


def load_or_random_gmm(args, feat_dim: int):
    import jax.numpy as jnp

    from mogasr.am.gmm import GmmSet

    if args.gmm_ckpt:
        from mogasr.utils.checkpoint import restore_checkpoint

        raw = restore_checkpoint(args.gmm_ckpt, None)
        return GmmSet(**{k: jnp.asarray(v) for k, v in raw.items()})
    rng = np.random.default_rng(0)
    S, K = args.num_states, args.num_components
    return GmmSet(
        jnp.asarray(rng.dirichlet(np.ones(K), size=S).astype(np.float32)),
        jnp.asarray(rng.standard_normal((S, K, feat_dim)).astype(np.float32)),
        jnp.asarray((0.5 + rng.random((S, K, feat_dim))).astype(np.float32)),
    )


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--add-pitch", action="store_true",
                   help="append the (POV, centered log-f0, delta log-f0) pitch "
                        "triple to the features (frontend/pitch.py) — must "
                        "match between training and decoding")
    add_corpus_args(p)
    add_run_args(p)
    p.add_argument("--gmm-ckpt", help="orbax GMM checkpoint dir")
    p.add_argument("--num-states", type=int, default=1000)
    p.add_argument("--num-components", type=int, default=256)
    p.add_argument("--compute-dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--out", help="write loglik matrices to this .npz")
    args = p.parse_args()

    import jax

    corpus, _lex = load_corpus(args)
    fcfg = FrontendConfig(add_pitch=args.add_pitch)
    logger = make_logger(args)
    batches = featurize(corpus, fcfg, BatchConfig())
    gmm = load_or_random_gmm(args, fcfg.feat_dim)

    # warm compile
    jax.block_until_ready(score_batch(batches[0].feats, gmm))
    with Timer() as t:
        outs = [score_batch(fb.feats, gmm) for fb in batches]
        jax.block_until_ready(outs)
    frames = int(sum(np.asarray(fb.n_frames).sum() for fb in batches))
    logger.log({
        "stage": "score", "frames": frames, "wall_sec": t.seconds,
        "frames_per_sec": frames / t.seconds,
        "S": gmm.n_states, "K": gmm.n_components,
    })
    if args.out:
        dump = {}
        for fb, ll in zip(batches, outs):
            nf = np.asarray(fb.n_frames)
            arr = np.asarray(ll)
            for i, utt_id in enumerate(fb.utt_ids):
                dump[utt_id] = arr[i, : nf[i]]
        np.savez_compressed(args.out, **dump)
        print(f"wrote loglik for {len(dump)} utterances to {args.out}")


if __name__ == "__main__":
    main()
