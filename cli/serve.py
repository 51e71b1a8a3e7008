"""Streaming recognition SERVER loop: many concurrent sessions over a
line-delimited JSON protocol.

The session-manager shape of a production streaming service, with the
transport reduced to stdin/stdout so it is hermetic and testable (a
socket/gRPC wrapper would feed the same event stream). One process holds
ONE compiled decoder (graph + jitted Viterbi step); every session carries
only its own small state (StreamingFrontend window + OnlineDecoder
carries), so sessions are cheap and independent.

Requests (one JSON object per line on stdin):
  {"type": "start", "session": ID}
  {"type": "audio", "session": ID, "pcm": [float, ...]}   16 kHz mono
  {"type": "end",   "session": ID}
  {"type": "shutdown"}
Responses (one JSON object per line on stdout):
  {"session": ID, "event": "ready"}
  {"session": ID, "partial": [words], "t_audio_s": S}     after each audio
  {"session": ID, "final": [words], "audio_s": S}         after end
  {"session": ID, "error": MSG}

    python cli/serve.py --synthetic-demo-session   # self-test: one session
    cat events.jsonl | python cli/serve.py
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from cli.common import add_run_args, make_logger
from cli.score import load_or_random_gmm
from mogasr.config import DecodeConfig, FrontendConfig, TopologyConfig
from mogasr.hmm.lexicon import load_lexicon, synthetic_lexicon
from mogasr.hmm.topology import build_topology


class _Session:
    def __init__(self, frontend, decoder):
        self.frontend = frontend
        self.decoder = decoder
        self.samples = 0


def main() -> None:
    import jax.numpy as jnp

    from mogasr.decoder.online import OnlineDecoder
    from mogasr.frontend.streaming import StreamingFrontend
    from mogasr.hmm import graph as gr
    from mogasr.pipeline import score_batch, word_decode_graph

    p = argparse.ArgumentParser(description=__doc__)
    add_run_args(p)
    p.add_argument("--lexicon", help="Kaldi-style lexicon.txt (default: synthetic)")
    p.add_argument("--gmm-ckpt", help="orbax GMM checkpoint dir")
    p.add_argument("--num-states", type=int, default=0)
    p.add_argument("--num-components", type=int, default=8)
    p.add_argument("--acoustic-scale", type=float, default=1.0)
    p.add_argument("--insertion-penalty", type=float, default=2.0)
    p.add_argument("--cmvn-window", type=int, default=600)
    p.add_argument("--max-sessions", type=int, default=64,
                   help="reject starts beyond this many live sessions")
    p.add_argument("--synthetic-demo-session", action="store_true",
                   help="self-test: synthesize one utterance and drive a "
                        "session through the protocol instead of stdin")
    args = p.parse_args()

    fcfg = FrontendConfig(cmvn="sliding", cmvn_window=args.cmvn_window)
    lex = load_lexicon(args.lexicon) if args.lexicon else synthetic_lexicon()
    topo = build_topology(lex, TopologyConfig())
    if args.num_states == 0:
        args.num_states = topo.n_pdfs
    dcfg = DecodeConfig(
        acoustic_scale=args.acoustic_scale,
        word_insertion_penalty=args.insertion_penalty,
    )
    gmm = load_or_random_gmm(args, fcfg.feat_dim)
    graph = word_decode_graph(lex, topo, dcfg)
    graphs = {
        k: jnp.asarray(v) for k, v in gr.batch_graphs([graph]).items()
    }
    logger = make_logger(args)

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

    sessions: dict = {}

    def emit(obj):
        print(json.dumps(obj), flush=True)

    def handle(ev) -> bool:
        """Process one event; returns False on shutdown."""
        typ = ev.get("type")
        if typ == "shutdown":
            return False
        sid = ev.get("session")
        if sid is None:
            emit({"error": "missing session id"})
            return True
        if typ == "start":
            if sid in sessions:
                emit({"session": sid, "error": "session exists"})
            elif len(sessions) >= args.max_sessions:
                emit({"session": sid, "error": "too many sessions"})
            else:
                sessions[sid] = _Session(
                    StreamingFrontend(fcfg),
                    OnlineDecoder(graphs, acoustic_scale=dcfg.acoustic_scale),
                )
                emit({"session": sid, "event": "ready"})
        elif typ == "audio":
            s = sessions.get(sid)
            if s is None:
                emit({"session": sid, "error": "no such session"})
                return True
            pcm = np.asarray(ev.get("pcm", []), np.float32)
            s.samples += len(pcm)
            feats = s.frontend.process(pcm)
            if feats.size:
                s.decoder.process(
                    score_batch(jnp.asarray(feats[None]), gmm),
                    np.asarray([feats.shape[0]]),
                )
            path, entered, _sc = s.decoder.partial()
            emit({
                "session": sid,
                "partial": words_of(path, entered),
                "t_audio_s": round(s.samples / fcfg.sample_rate, 2),
            })
        elif typ == "end":
            s = sessions.pop(sid, None)
            if s is None:
                emit({"session": sid, "error": "no such session"})
                return True
            feats = s.frontend.finalize()
            if feats.size:
                s.decoder.process(
                    score_batch(jnp.asarray(feats[None]), gmm),
                    np.asarray([feats.shape[0]]),
                )
            path, entered, _sc = s.decoder.finalize()
            audio_s = s.samples / fcfg.sample_rate
            final = words_of(path, entered)
            emit({"session": sid, "final": final,
                  "audio_s": round(audio_s, 2)})
            logger.log({"stage": "serve_final", "session": sid,
                        "audio_s": round(audio_s, 2), "words": final})
        else:
            emit({"session": sid, "error": f"unknown type {typ!r}"})
        return True

    if args.synthetic_demo_session:
        from mogasr.data.synthetic import make_corpus

        utt = make_corpus(1, words_per_utt=(2, 3), seed=7)[0]
        chunk = fcfg.sample_rate // 4
        handle({"type": "start", "session": "demo"})
        for i in range(0, len(utt.wave), chunk):
            handle({"type": "audio", "session": "demo",
                    "pcm": utt.wave[i : i + chunk].tolist()})
        handle({"type": "end", "session": "demo"})
        return

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            ev = json.loads(line)
        except json.JSONDecodeError as e:
            emit({"error": f"bad json: {e}"})
            continue
        if not handle(ev):
            break


if __name__ == "__main__":
    main()
