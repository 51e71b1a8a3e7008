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
    p.add_argument("--endpoint", action="store_true",
                   help="causal endpointing (frontend/endpoint.py): stop "
                        "decoding and finalize when a rule fires (trailing "
                        "silence / no speech / max length)")
    p.add_argument("--endpoint-trailing-sil", type=float, default=0.5,
                   help="rule-1 trailing-silence seconds")
    p.add_argument("--ctc", action="store_true",
                   help="neural online CTC instead of the GMM: a streaming "
                        "LSTM (train_nn --objective ctc --arch lstm ckpt via "
                        "--nn-ckpt) scores chunks statefully; words decode "
                        "through the OnlineDecoder on the CTC graph")
    p.add_argument("--rnnt", action="store_true",
                   help="online RNN-transducer: stateful LSTM encoder chunks "
                        "+ chunk-resumable on-device greedy (phone partials, "
                        "or open-vocabulary words with --bpe; train_nn "
                        "--objective rnnt ckpt via --nn-ckpt)")
    p.add_argument("--rnnt-pred", default="stateless", choices=["stateless", "lstm"],
                   help="RNN-T prediction-net architecture — must match the "
                        "checkpoint (mirrors cli/decode.py)")
    p.add_argument("--rnnt-plain", action="store_true",
                   help="checkpoint was trained WITHOUT the auxiliary CTC head "
                        "(train_rnnt aux_ctc=False)")
    p.add_argument("--rnnt-pruned", action="store_true",
                   help="ckpt trained with the pruned transducer loss "
                        "(train_nn --rnnt-pruned-band): tree has the "
                        "factored simple_am/simple_lm heads")
    p.add_argument("--aed", action="store_true",
                   help="streaming AED: chunked Conformer encoder trained "
                        "with train_nn --objective aed --aed-chunk C; CTC-head "
                        "greedy partials per chunk, exact attention-beam "
                        "finalization (offline == streamed, tested)")
    p.add_argument("--aed-chunk", type=int, default=8,
                   help="subsampled frames per chunk (must match training)")
    p.add_argument("--aed-left-chunks", type=int, default=1,
                   help="left-context chunks (must match training)")
    p.add_argument("--aed-beam", type=int, default=4,
                   help="final attention beam width")
    p.add_argument("--aed-ctc-weight", type=float, default=0.3,
                   help="joint CTC weight in the final rescoring")
    p.add_argument("--max-symbols", type=int, default=0,
                   help="with --rnnt: hypothesis-buffer cap (0 = scale with "
                        "the audio length; the buffer silently stops "
                        "recording labels past the cap)")
    p.add_argument("--nn-ckpt", help="CTC/RNN-T checkpoint dir (with --ctc/--rnnt)")
    p.add_argument("--bpe", metavar="FILE",
                   help="with --ctc/--rnnt: the checkpoint uses BPE subword "
                        "units (train_nn --bpe-merges; FILE is its bpe.json) "
                        "— streaming OPEN-VOCABULARY word partials, no "
                        "lexicon or graph")
    p.add_argument("--bias", metavar="FILE",
                   help="with --ctc --bpe: contextual phrase biasing during "
                        "the streaming prefix beam (one phrase per line; "
                        "mogasr.decoder.biasing)")
    p.add_argument("--bias-weight", type=float, default=2.0)
    p.add_argument("--bias-beam", type=int, default=8)
    p.add_argument("--fusion-lm", metavar="FILE",
                   help="with --ctc --bpe: unit-bigram shallow fusion in the "
                        "streaming prefix beam (train_lm --unit-ngram); "
                        "composes with --bias")
    p.add_argument("--fusion-weight", type=float, default=0.5)
    p.add_argument("--nn-hidden", type=int, default=512)
    p.add_argument("--nn-layers", type=int, default=3)
    args = p.parse_args()

    fcfg = FrontendConfig(cmvn="sliding", cmvn_window=args.cmvn_window)
    if args.synthetic_demo:
        from mogasr.data.synthetic import make_corpus

        utt = make_corpus(1, words_per_utt=(4, 6), seed=7)[0]
        wave = utt.wave
        if args.endpoint:  # give rule 1 trailing silence to detect
            pad = np.zeros(int(2.0 * fcfg.sample_rate), np.float32)
            wave = np.concatenate([wave, pad])
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
    logger = make_logger(args)

    if args.aed and (args.ctc or args.rnnt):
        raise SystemExit("--aed is its own streaming family: drop --ctc/--rnnt")

    if args.aed:
        import jax

        from mogasr.am import aed as A
        from mogasr.am.ctc import CtcStreamDecoder
        from mogasr.config import TrainConfig
        from mogasr.utils.checkpoint import restore_checkpoint

        if not args.nn_ckpt:
            raise SystemExit("--aed requires --nn-ckpt (train_nn --objective "
                             "aed --aed-chunk C)")
        if args.bpe:
            from mogasr.data.bpe import load_bpe

            bpe = load_bpe(args.bpe)
            n_units = bpe.n_units
        else:
            bpe = None
            n_units = lex.n_phones
        tcfg = TrainConfig(nn_hidden=args.nn_hidden, nn_layers=args.nn_layers)
        model = A.build_aed_model(
            n_units, tcfg, chunk_frames=args.aed_chunk,
            left_chunks=args.aed_left_chunks,
        )
        template = {
            "params": A.init_aed_train_state(
                model, tcfg, fcfg.feat_dim, 4, jax.random.key(0)
            ).params,
        }
        params = restore_checkpoint(args.nn_ckpt, template)["params"]
        step = A.make_aed_stream_step(model, params)
        state = A.aed_stream_init(model, batch=1, n_feats=fcfg.feat_dim)
        ctc_dec = CtcStreamDecoder(blank_id=n_units, mode="greedy")
        raw_per = 4 * args.aed_chunk
        sf = StreamingFrontend(fcfg)
        chunk = int(fcfg.sample_rate * args.chunk_ms / 1000.0)
        buf = np.zeros((0, fcfg.feat_dim), np.float32)
        all_feats: list = []

        def consume(feats):
            """Buffer feature frames; stream every complete encoder chunk
            through the chunked Conformer + CTC-greedy partial decoder."""
            nonlocal buf, state
            all_feats.append(feats)
            buf = np.concatenate([buf, feats], axis=0)
            while buf.shape[0] >= raw_per:
                _enc, ctc_logits, state = step(
                    jnp.asarray(buf[None, :raw_per]), state
                )
                ctc_dec.step(np.asarray(
                    jax.nn.log_softmax(ctc_logits[0], axis=-1)
                ))
                buf = buf[raw_per:]

        def to_text(units):
            return bpe.decode(units) if bpe else [lex.phones[u] for u in units]

        with Timer() as t:
            for i in range(0, len(wave), chunk):
                consumed = min(i + chunk, len(wave))
                feats = sf.process(wave[i : i + chunk])
                if feats.size:
                    consume(feats)
                print(json.dumps({
                    "t_audio_s": round(consumed / fcfg.sample_rate, 2),
                    "partial": to_text(ctc_dec.partial()),
                }), flush=True)
            feats = sf.finalize()
            if feats.size:
                consume(feats)
            # attention finalization: exact offline beam decode of the full
            # utterance — identical checkpoint, and the chunk-masked offline
            # encoder equals the streamed prefix (tests/test_aed_stream.py),
            # so this is a refinement of the partials, not a different model
            fa = np.concatenate(all_feats, axis=0) if all_feats else buf
            seqs = A.aed_decode_batch(
                model, params, jnp.asarray(fa[None]),
                jnp.asarray([fa.shape[0]], np.int32),
                beam=args.aed_beam, max_tokens=max(8, 2 + fa.shape[0] // 4),
                ctc_weight=args.aed_ctc_weight,
            )
        audio_s = len(wave) / fcfg.sample_rate
        final = to_text(seqs[0])
        print(json.dumps({"final": final, "rtf": round(t.seconds / audio_s, 4)}))
        logger.log({
            "stage": "stream_aed", "audio_s": round(audio_s, 2),
            "wall_sec": t.seconds, "rtf": t.seconds / max(audio_s, 1e-9),
            "final_units": final,
        })
        return

    if args.rnnt:
        import jax

        from mogasr.am.rnnt import RnntDeviceStream, build_rnnt_model, init_rnnt_train_state
        from mogasr.config import TrainConfig
        from mogasr.utils.checkpoint import restore_checkpoint

        if not args.nn_ckpt:
            raise SystemExit("--rnnt requires --nn-ckpt (train_nn --objective rnnt)")
        if args.bpe:
            from mogasr.data.bpe import load_bpe

            rnnt_bpe = load_bpe(args.bpe)
            n_rnnt_units = rnnt_bpe.n_units
            to_text = rnnt_bpe.decode
        else:
            rnnt_bpe = None
            n_rnnt_units = lex.n_phones
            to_text = lambda units: [lex.phones[u] for u in units]
        tcfg = TrainConfig(nn_arch="lstm", nn_hidden=args.nn_hidden,
                           nn_layers=args.nn_layers)
        model = build_rnnt_model(
            n_rnnt_units, tcfg,
            pred_arch=args.rnnt_pred, aux_ctc=not args.rnnt_plain,
            simple_heads=args.rnnt_pruned,
        )
        template = {
            "params": init_rnnt_train_state(
                model, tcfg, fcfg.feat_dim, 4, jax.random.key(0)
            ).params,
        }
        params = restore_checkpoint(args.nn_ckpt, template)["params"]
        # cap scales with audio length (≈2 symbols/frame ceiling) unless set
        total_frames = fcfg.num_frames(len(wave)) + 8
        u_cap = args.max_symbols if args.max_symbols > 0 else 2 * total_frames
        rnnt_stream = RnntDeviceStream(model, params, 1, fcfg.feat_dim, u_cap=u_cap)
        sf = StreamingFrontend(fcfg)
        chunk = int(fcfg.sample_rate * args.chunk_ms / 1000.0)
        part: list = []
        with Timer() as t:
            for i in range(0, len(wave), chunk):
                consumed = min(i + chunk, len(wave))
                feats = sf.process(wave[i : i + chunk])
                if feats.size:
                    part = rnnt_stream.consume(
                        jnp.asarray(feats[None]), np.asarray([feats.shape[0]])
                    )
                print(json.dumps({
                    "t_audio_s": round(consumed / fcfg.sample_rate, 2),
                    "partial": to_text(part[0]) if part else [],
                }), flush=True)
            feats = sf.finalize()
            if feats.size:
                part = rnnt_stream.consume(
                    jnp.asarray(feats[None]), np.asarray([feats.shape[0]])
                )
        audio_s = len(wave) / fcfg.sample_rate
        final = to_text(part[0]) if part else []
        print(json.dumps({"final": final, "rtf": round(t.seconds / audio_s, 4)}))
        logger.log({
            "stage": "stream_rnnt", "audio_s": round(audio_s, 2),
            "wall_sec": t.seconds, "rtf": t.seconds / max(audio_s, 1e-9),
            "final_phones": final,
        })
        return

    if args.ctc:
        import jax

        from mogasr.am.ctc import ctc_decode_graph
        from mogasr.am.neural import (
            LstmAm, LstmAmStream, lstm_stream_init,
        )
        from mogasr.am.train_nn import init_train_state
        from mogasr.config import TrainConfig
        from mogasr.utils.checkpoint import restore_checkpoint

        if not args.nn_ckpt:
            raise SystemExit("--ctc requires --nn-ckpt (train_nn --objective "
                             "ctc --arch lstm)")
        if args.bpe:
            from mogasr.data.bpe import load_bpe

            bpe = load_bpe(args.bpe)
            V = bpe.n_units + 1
        else:
            bpe = None
            V = lex.n_phones + 1
        tcfg = TrainConfig(nn_arch="lstm", nn_hidden=args.nn_hidden,
                           nn_layers=args.nn_layers)
        model = LstmAm(n_pdfs=V, hidden=args.nn_hidden,
                       layers=max(args.nn_layers - 1, 1))
        template = {
            "params": init_train_state(model, tcfg, fcfg.feat_dim,
                                       jax.random.key(0)).params,
        }
        nn_params = restore_checkpoint(args.nn_ckpt, template)["params"]
        stream_model = LstmAmStream(
            n_pdfs=V, hidden=args.nn_hidden, layers=max(args.nn_layers - 1, 1)
        )
        carries = lstm_stream_init(model, 1, fcfg.feat_dim)

        @jax.jit
        def score_chunk(carries, feats):
            logits, new_carries = stream_model.apply(nn_params, feats, carries)
            return jax.nn.log_softmax(logits, axis=-1), new_carries

        if bpe is not None:
            # open-vocabulary streaming: greedy unit collapse -> bpe.decode,
            # no lexicon, no graph, no graph-decoder state
            from mogasr.am.ctc import CtcStreamDecoder

            if args.bias or args.fusion_lm:
                from mogasr.lm.unit_ngram import compose_ext_scores

                exts = []
                if args.bias:
                    from mogasr.decoder.biasing import (
                        biaser_from_bpe, load_phrases,
                    )

                    exts.append(biaser_from_bpe(
                        bpe, load_phrases(args.bias), weight=args.bias_weight
                    ).score)
                if args.fusion_lm:
                    from mogasr.lm.unit_ngram import fusion_score, load_unit_lm

                    exts.append(fusion_score(
                        load_unit_lm(args.fusion_lm), args.fusion_weight
                    ))
                ctc_dec = CtcStreamDecoder(
                    blank_id=V - 1, mode="beam", beam_size=args.bias_beam,
                    ext_score=compose_ext_scores(exts),
                )
            else:
                ctc_dec = CtcStreamDecoder(blank_id=V - 1, mode="greedy")
            sf = StreamingFrontend(fcfg)
            chunk = int(fcfg.sample_rate * args.chunk_ms / 1000.0)
            part_words: list = []
            with Timer() as t:
                for i in range(0, len(wave), chunk):
                    consumed = min(i + chunk, len(wave))
                    feats = sf.process(wave[i : i + chunk])
                    if feats.size:
                        sc, carries = score_chunk(carries, jnp.asarray(feats[None]))
                        ctc_dec.step(np.asarray(sc[0]))
                    part_words = bpe.decode(ctc_dec.partial())
                    print(json.dumps({
                        "t_audio_s": round(consumed / fcfg.sample_rate, 2),
                        "partial": part_words,
                    }), flush=True)
                feats = sf.finalize()
                if feats.size:
                    sc, carries = score_chunk(carries, jnp.asarray(feats[None]))
                    ctc_dec.step(np.asarray(sc[0]))
                part_words = bpe.decode(ctc_dec.finalize())
            audio_s = len(wave) / fcfg.sample_rate
            print(json.dumps({"final": part_words,
                              "rtf": round(t.seconds / audio_s, 4)}))
            logger.log({
                "stage": "stream_ctc_bpe", "audio_s": round(audio_s, 2),
                "wall_sec": t.seconds, "rtf": t.seconds / max(audio_s, 1e-9),
                "final_words": part_words,
            })
            return

        graph = ctc_decode_graph(lex, dcfg)
        gmm = None
    else:
        gmm = load_or_random_gmm(args, fcfg.feat_dim)
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

    def score_feats(feats):
        nonlocal carries
        if args.ctc:
            sc, carries = score_chunk(carries, jnp.asarray(feats[None]))
            return sc
        return score_batch(jnp.asarray(feats[None]), gmm)

    if not args.ctc:
        carries = None
    ep = None
    if args.endpoint:
        from mogasr.frontend.endpoint import EndpointConfig, StreamingEndpointer

        ep = StreamingEndpointer(fcfg, EndpointConfig(
            rule1_trailing_sil_s=args.endpoint_trailing_sil))
    with Timer() as t:
        for i in range(0, len(wave), chunk):
            consumed = min(i + chunk, len(wave))
            feats = sf.process(wave[i : i + chunk])
            if feats.size:
                dec.process(score_feats(feats), np.asarray([feats.shape[0]]))
            path, entered, _score = dec.partial()
            event = {
                "t_audio_s": round(consumed / fcfg.sample_rate, 2),
                "partial": words_of(path, entered),
            }
            if ep is not None and ep.feed(wave[i : i + chunk]):
                event["endpoint"] = ep.rule
                print(json.dumps(event), flush=True)
                break
            print(json.dumps(event), flush=True)
        feats = sf.finalize()
        if feats.size:
            dec.process(score_feats(feats), np.asarray([feats.shape[0]]))
        path, entered, score = dec.finalize()
    audio_s = consumed / fcfg.sample_rate  # decoded audio (endpoint may stop early)
    final = words_of(path, entered)
    rec = {"final": final, "rtf": round(t.seconds / max(audio_s, 1e-9), 4)}
    if ep is not None and ep.endpointed:
        rec["endpoint"] = ep.rule
        rec["endpoint_t_s"] = round(
            ep.endpoint_frame * fcfg.frame_shift_ms / 1000.0, 2)
    print(json.dumps(rec))
    logger.log({
        "stage": "stream", "audio_s": round(audio_s, 2),
        "wall_sec": t.seconds, "rtf": t.seconds / max(audio_s, 1e-9),
        "final_words": final,
        **({"endpoint": ep.rule} if ep is not None and ep.endpointed else {}),
    })


if __name__ == "__main__":
    main()
