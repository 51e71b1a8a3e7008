"""Online (streaming) recognition demo: audio chunks in, hypotheses out.

The true-online path end to end: causal sliding-window CMVN features from
the chunked StreamingFrontend feed the incremental OnlineDecoder as the
audio 'arrives'; a partial hypothesis is printed after every chunk and the
exact (offline-equivalent, tested) result at the end. Emits one JSON line
per event: {"t_audio_s", "partial"} per chunk, then {"final", "rtf"}.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from cli.common import add_run_args, make_logger
from cli.score import load_or_random_gmm
from mogasr.config import DecodeConfig, FrontendConfig, TopologyConfig
from mogasr.hmm.lexicon import load_lexicon, synthetic_lexicon
from mogasr.hmm.topology import build_topology
from mogasr.utils.metrics import Timer


def main() -> None:
    import jax.numpy as jnp

    from mogasr.decoder import viterbi as vit
    from mogasr.decoder.online import OnlineDecoder
    from mogasr.frontend.streaming import StreamingFrontend
    from mogasr.hmm import graph as gr
    from mogasr.pipeline import score_batch, word_decode_graph

    p = argparse.ArgumentParser(description=__doc__)
    add_run_args(p)
    p.add_argument("--audio", help="wav file to stream")
    p.add_argument("--synthetic-demo", action="store_true",
                   help="stream a generated utterance instead of a file")
    p.add_argument("--lexicon", help="Kaldi-style lexicon.txt (default: synthetic)")
    p.add_argument("--gmm-ckpt", help="orbax GMM checkpoint dir")
    p.add_argument("--num-states", type=int, default=0)
    p.add_argument("--num-components", type=int, default=8)
    p.add_argument("--acoustic-scale", type=float, default=1.0)
    p.add_argument("--insertion-penalty", type=float, default=2.0)
    p.add_argument("--chunk-ms", type=float, default=250.0)
    p.add_argument("--cmvn-window", type=int, default=600)
    args = p.parse_args()

    fcfg = FrontendConfig(cmvn="sliding", cmvn_window=args.cmvn_window)
    if args.synthetic_demo:
        from mogasr.data.synthetic import make_corpus

        utt = make_corpus(1, words_per_utt=(4, 6), seed=7)[0]
        wave = utt.wave
    elif args.audio:
        from mogasr.data.audio import read_audio

        wave, _sr = read_audio(args.audio, target_sr=fcfg.sample_rate)
    else:
        raise SystemExit("pass --audio FILE or --synthetic-demo")

    lex = load_lexicon(args.lexicon) if args.lexicon else synthetic_lexicon()
    topo = build_topology(lex, TopologyConfig())
    if args.num_states == 0:
        args.num_states = topo.n_pdfs
    dcfg = DecodeConfig(
        acoustic_scale=args.acoustic_scale,
        word_insertion_penalty=args.insertion_penalty,
    )
    gmm = load_or_random_gmm(args, fcfg.feat_dim)
    logger = make_logger(args)

    graph = word_decode_graph(lex, topo, dcfg)
    graphs_np = gr.batch_graphs([graph])
    graphs = {k: jnp.asarray(v) for k, v in graphs_np.items()}

    def words_of(path, entered):
        toks = []
        for t in range(path.shape[1]):
            j = path[0, t]
            if j < 0:
                break
            if entered[0, t]:
                w = graph.labels[graph.chain_id[j]]
                if w not in ("<sil>", "sil"):
                    toks.append(w)
        return toks

    sf = StreamingFrontend(fcfg)
    dec = OnlineDecoder(graphs, acoustic_scale=dcfg.acoustic_scale)
    chunk = int(fcfg.sample_rate * args.chunk_ms / 1000.0)
    consumed = 0
    with Timer() as t:
        for i in range(0, len(wave), chunk):
            consumed = min(i + chunk, len(wave))
            feats = sf.process(wave[i : i + chunk])
            if feats.size:
                sc = score_batch(jnp.asarray(feats[None]), gmm)
                dec.process(sc, np.asarray([feats.shape[0]]))
            path, entered, _score = dec.partial()
            print(json.dumps({
                "t_audio_s": round(consumed / fcfg.sample_rate, 2),
                "partial": words_of(path, entered),
            }), flush=True)
        feats = sf.finalize()
        if feats.size:
            sc = score_batch(jnp.asarray(feats[None]), gmm)
            dec.process(sc, np.asarray([feats.shape[0]]))
        path, entered, score = dec.finalize()
    audio_s = len(wave) / fcfg.sample_rate
    final = words_of(path, entered)
    print(json.dumps({"final": final, "rtf": round(t.seconds / audio_s, 4)}))
    logger.log({
        "stage": "stream", "audio_s": round(audio_s, 2),
        "wall_sec": t.seconds, "rtf": t.seconds / max(audio_s, 1e-9),
        "final_words": final,
    })


if __name__ == "__main__":
    main()
