"""config[3] training: neural frame classifier (MLP/LSTM) on GMM alignments.

Bootstrap labels come from forced alignment with a trained (or flat-start)
GMM; training is CE + AdamW (SURVEY.md §3.4).

--objective ctc trains the same architectures ALIGNMENT-FREE with CTC
(mogasr.am.ctc): no GMM bootstrap, targets are the transcript phone
sequences; decode with ``cli/decode.py --ctc``."""

from __future__ import annotations

import argparse
import os

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from cli.common import (
    add_augment_args, add_corpus_args, add_run_args, apply_augmentation,
    load_corpus, make_logger,
)
from mogasr.config import (
    BatchConfig, FrontendConfig, GmmConfig, TopologyConfig, TrainConfig,
)
from mogasr.hmm.topology import build_topology
from mogasr.pipeline import align_batch, featurize, train_gmm
from mogasr.utils.checkpoint import save_checkpoint
from mogasr.utils.metrics import Timer


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--add-pitch", action="store_true",
                   help="append the (POV, centered log-f0, delta log-f0) pitch "
                        "triple to the features (frontend/pitch.py) — must "
                        "match between training and decoding")
    add_corpus_args(p)
    add_run_args(p)
    add_augment_args(p)
    p.add_argument("--arch", default="mlp",
                   choices=["mlp", "lstm", "blstm", "tdnn", "conformer", "moe"])
    p.add_argument("--hidden", type=int, default=512)
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--experts", type=int, default=4,
                   help="with --arch moe: number of top-1-routed FFN experts "
                        "(CE objective; decode with --am moe --nn-experts; "
                        "expert-parallel over an ('expert',) mesh via "
                        "mogasr.dist.expert_parallel)")
    p.add_argument("--steps", type=int, default=500)  # must be >= 1
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--spec-augment", action="store_true",
                   help="SpecAugment time/feature masking during training")
    p.add_argument("--objective", default="ce",
                   choices=["ce", "ctc", "rnnt", "aed", "mpc"],
                   help="ce: frame CE on GMM forced alignments; "
                        "ctc: alignment-free CTC on transcript phone targets; "
                        "rnnt: RNN-transducer (label-history-conditioned, "
                        "streaming-native; --arch picks the encoder lstm/blstm); "
                        "aed: attention encoder-decoder (Conformer + "
                        "Transformer decoder, joint CTC/attention loss; "
                        "--hidden/--layers size the Conformer, --arch ignored); "
                        "mpc: UNSUPERVISED masked-predictive-coding "
                        "pretraining of the --arch encoder (no transcripts "
                        "read) — warm-start a later CTC run with "
                        "--init-from RUN_DIR/nn_mpc_ARCH")
    p.add_argument("--aed-chunk", type=int, default=0, metavar="C",
                   help="with --objective aed: train the STREAMING-capable "
                        "chunked encoder (causal convs, attention masked to "
                        "C subsampled frames per chunk; decode offline or "
                        "stream with cli/stream.py --aed)")
    p.add_argument("--aed-left-chunks", type=int, default=1,
                   help="left-context chunks visible to attention")
    p.add_argument("--rnnt-pruned-band", type=int, default=0, metavar="S",
                   help="with --objective rnnt: train with the pruned "
                        "transducer loss (mogasr.am.rnnt_pruned) — the "
                        "joint runs only on an occupancy-selected (t, u) "
                        "band of width S (joint GEMMs shrink (U+1)/S); "
                        "decode the ckpt with --rnnt-pruned on the "
                        "decode/eval/stream/serve/transcribe CLIs")
    p.add_argument("--mwer-steps", type=int, default=0, metavar="N",
                   help="with --objective aed/rnnt: N steps of on-policy "
                        "MWER (minimum word error rate) fine-tuning after "
                        "the main phase — beam N-best against the current "
                        "params, expected edit-distance risk minimized")
    p.add_argument("--bpe-merges", type=int, default=0, metavar="N",
                   help="with --objective ctc/aed: train on BPE SUBWORD units "
                        "(N merges learned from the transcripts) instead of "
                        "phones — lexicon-free word recognition; writes "
                        "bpe.json next to the checkpoint")
    p.add_argument("--init-from", metavar="CKPT_DIR",
                   help="with --objective ctc: warm-start the encoder from "
                        "an MPC-pretrained checkpoint (train_nn --objective "
                        "mpc with the SAME --arch/--hidden/--layers); the "
                        "CTC head keeps its fresh init")
    p.add_argument("--distill-from", metavar="CKPT_DIR",
                   help="with --objective ctc: knowledge distillation — "
                        "train THIS (student) model to match the frame "
                        "posteriors of a trained CTC teacher checkpoint "
                        "(train_nn --objective ctc; the teacher's unit "
                        "inventory is reused: bpe.json next to the ckpt if "
                        "present, else lexicon phones). The student ckpt is "
                        "a drop-in CTC model for decode/stream/serve")
    p.add_argument("--distill-teacher-arch", default="conformer",
                   choices=["mlp", "lstm", "blstm", "tdnn", "conformer"],
                   help="teacher architecture — must match the checkpoint")
    p.add_argument("--distill-teacher-hidden", type=int, default=512)
    p.add_argument("--distill-teacher-layers", type=int, default=3)
    p.add_argument("--distill-alpha", type=float, default=0.5,
                   help="soft-target weight: alpha*KL + (1-alpha)*CTC")
    p.add_argument("--distill-temp", type=float, default=2.0,
                   help="distillation softmax temperature")
    p.add_argument("--ivector-dim", type=int, default=0, metavar="R",
                   help="CE path: train an i-vector extractor (UBM + "
                        "total variability) on the training features and "
                        "append per-utterance i-vectors to every frame — "
                        "speaker-aware hybrid training (decode with "
                        "--ivector-ckpt RUN_DIR/ivector_extractor)")
    p.add_argument("--ivector-components", type=int, default=64)
    p.add_argument("--seq-mmi-steps", type=int, default=0, metavar="N",
                   help="CE path: N steps of sequence-discriminative MMI "
                        "fine-tuning after CE — autodiff through the "
                        "forward-backward over alignment (num) and word-loop "
                        "(den) graphs; priors frozen (mogasr.am.nn_seq)")
    p.add_argument("--seq-mmi-scale", type=float, default=0.1,
                   help="MMI acoustic scale (kappa)")
    p.add_argument("--seq-smbr-steps", type=int, default=0, metavar="N",
                   help="CE path: N steps of sMBR fine-tuning after CE (and "
                        "after --seq-mmi-steps, if both) — autodiff of the "
                        "posterior-expected frame accuracy over the word-loop "
                        "denominator, CE labels as reference (mogasr.am."
                        "nn_seq)")
    p.add_argument("--save-every", type=int, default=0, metavar="N",
                   help="checkpoint every N steps (CE path) — enables "
                        "--average-last")
    p.add_argument("--average-last", type=int, default=0, metavar="K",
                   help="after training, save the uniform average of the "
                        "last K checkpoints as the newest step (checkpoint "
                        "averaging, the standard late-training smoother)")
    p.add_argument("--bootstrap-iters", type=int, default=6,
                   help="EM iterations for the GMM that produces labels")
    p.add_argument("--bootstrap-components", type=int, default=4)
    args = p.parse_args()
    if args.steps < 1:
        raise SystemExit("--steps must be >= 1")
    if args.arch == "moe" and args.objective != "ce":
        raise SystemExit(
            "--arch moe supports --objective ce (the hybrid CE path collects "
            "the MoE load-balance aux loss; the CTC/RNN-T/AED/MPC steps "
            "would silently drop it)")

    import jax
    import jax.numpy as jnp

    from mogasr.am.neural import build_model
    from mogasr.am.train_nn import init_train_state, make_train_step

    corpus, lex = load_corpus(args)
    corpus = apply_augmentation(corpus, args)
    fcfg = FrontendConfig(add_pitch=args.add_pitch)
    topo = build_topology(lex, TopologyConfig())
    logger = make_logger(args)
    batches = featurize(corpus, fcfg, BatchConfig())

    if args.objective in ("ctc", "rnnt", "aed", "mpc"):
        import jax.numpy as jnp

        from mogasr.pipeline import train_aed, train_ctc, train_rnnt

        tcfg = TrainConfig(
            nn_arch=args.arch, nn_hidden=args.hidden, nn_layers=args.layers,
            lr=args.lr, num_nn_steps=args.steps,
        )
        init_params = None
        if args.init_from:
            if args.objective != "ctc":
                raise SystemExit("--init-from (MPC warm start) supports "
                                 "--objective ctc")
            from mogasr.utils.checkpoint import restore_checkpoint

            pre_model = build_model(args.arch, fcfg.feat_dim, tcfg)
            template = {"params": pre_model.init(
                jax.random.key(0), jnp.zeros((2, 8, fcfg.feat_dim)),
                jnp.asarray([8, 8]))}
            init_params = restore_checkpoint(
                os.path.abspath(args.init_from), template)["params"]
        if args.distill_from and args.objective != "ctc":
            raise SystemExit("--distill-from supports --objective ctc")
        if args.distill_from and args.bpe_merges > 0:
            raise SystemExit("--distill-from reuses the TEACHER's unit "
                             "inventory (its bpe.json): drop --bpe-merges")
        with Timer() as t:
            if args.objective == "mpc":
                from mogasr.am.pretrain import pretrain_mpc

                model, params = pretrain_mpc(
                    batches, tcfg, arch=args.arch, logger=logger,
                )
            elif args.distill_from:
                from mogasr.am.ctc import (
                    ctc_labels_from_words, init_ctc_train_state,
                )
                from mogasr.pipeline import distill_ctc_units
                from mogasr.utils.checkpoint import restore_checkpoint

                teacher_dir = os.path.abspath(args.distill_from)
                bpe_path = os.path.join(os.path.dirname(teacher_dir),
                                        "bpe.json")
                if os.path.exists(bpe_path):
                    from mogasr.data.bpe import load_bpe, save_bpe

                    bpe = load_bpe(bpe_path)
                    encode_fn, n_units = bpe.encode, bpe.n_units
                    # student run dir gets the same inventory for decode
                    save_bpe(bpe, os.path.join(
                        os.path.abspath(args.run_dir), "bpe.json"))
                else:
                    encode_fn = lambda words: ctc_labels_from_words(  # noqa: E731
                        lex, words, include_sil=False)
                    n_units = lex.n_phones
                t_tcfg = TrainConfig(
                    nn_arch=args.distill_teacher_arch,
                    nn_hidden=args.distill_teacher_hidden,
                    nn_layers=args.distill_teacher_layers,
                )
                teacher_model = build_model(
                    args.distill_teacher_arch, n_units + 1, t_tcfg)
                template = {"params": init_ctc_train_state(
                    teacher_model, t_tcfg, fcfg.feat_dim, jax.random.key(0)
                ).params}
                t_ck = restore_checkpoint(teacher_dir, template)
                model, params = distill_ctc_units(
                    batches, teacher_model, t_ck["params"], encode_fn,
                    n_units, tcfg, student_arch=args.arch,
                    alpha=args.distill_alpha, temperature=args.distill_temp,
                    spec_augment=args.spec_augment, logger=logger,
                )
            elif args.bpe_merges > 0:
                from mogasr.data.bpe import save_bpe, train_bpe
                from mogasr.pipeline import (
                    train_aed_bpe, train_ctc_bpe, train_rnnt_bpe,
                )

                transcripts = [fb.words[b] for fb in batches for b in range(fb.size)]
                bpe = train_bpe(transcripts, n_merges=args.bpe_merges)
                save_bpe(bpe, os.path.join(os.path.abspath(args.run_dir), "bpe.json"))
                if args.objective == "aed":
                    model, params = train_aed_bpe(
                        batches, bpe, tcfg, logger=logger,
                        chunk_frames=args.aed_chunk,
                        left_chunks=args.aed_left_chunks,
                        spec_augment=args.spec_augment,
                    )
                elif args.objective == "rnnt":
                    if args.arch not in ("lstm", "blstm"):
                        raise SystemExit("--objective rnnt needs --arch "
                                         "lstm/blstm")
                    model, params = train_rnnt_bpe(
                        batches, bpe, tcfg, encoder_arch=args.arch,
                        pruned_band=args.rnnt_pruned_band,
                        logger=logger,
                    )
                else:
                    model, params = train_ctc_bpe(
                        batches, bpe, tcfg, arch=args.arch,
                        spec_augment=args.spec_augment, logger=logger,
                    )
            elif args.objective == "aed":
                model, params = train_aed(
                    batches, lex, tcfg, logger=logger,
                    chunk_frames=args.aed_chunk,
                    left_chunks=args.aed_left_chunks,
                    spec_augment=args.spec_augment,
                )
            elif args.objective == "ctc":
                model, params = train_ctc(
                    batches, lex, tcfg, arch=args.arch,
                    spec_augment=args.spec_augment,
                    init_params=init_params, logger=logger,
                )
            else:
                if args.arch not in ("lstm", "blstm"):
                    raise SystemExit("--objective rnnt needs --arch lstm/blstm")
                model, params = train_rnnt(
                    batches, lex, tcfg, encoder_arch=args.arch,
                    pruned_band=args.rnnt_pruned_band, logger=logger,
                )
        if args.objective in ("aed", "rnnt") and args.mwer_steps > 0:
            from mogasr.am.ctc import ctc_labels_from_words
            from mogasr.pipeline import finetune_aed_mwer, finetune_rnnt_mwer

            if args.bpe_merges > 0:
                encode_fn = bpe.encode
            else:
                encode_fn = lambda words: ctc_labels_from_words(  # noqa: E731
                    lex, words, include_sil=False)
            ft = finetune_aed_mwer if args.objective == "aed" else finetune_rnnt_mwer
            params, mwer_hist = ft(
                model, params, batches, encode_fn, tcfg,
                steps=args.mwer_steps, logger=logger,
            )
            logger.log({
                "stage": "mwer_done", "steps": args.mwer_steps,
                "expected_risk_first": mwer_hist[0],
                "expected_risk_last": mwer_hist[-1],
            })
        logger.log({"stage": f"train_{args.objective}_done", "steps": args.steps,
                    "wall_sec": t.seconds})
        ckpt = os.path.join(
            os.path.abspath(args.run_dir), f"nn_{args.objective}_{args.arch}"
        )
        save_checkpoint(ckpt, {"params": params}, step=args.steps)
        print(f"saved {args.objective.upper()} {args.arch} AM to {ckpt}")
        return

    # GMM bootstrap for alignment labels (stack 3.3)
    gcfg = GmmConfig(
        n_states=topo.n_pdfs, n_components=args.bootstrap_components,
        feat_dim=fcfg.feat_dim,
    )
    gmm, _hist = train_gmm(
        batches, lex, topo, gcfg, TrainConfig(num_em_iters=args.bootstrap_iters),
        logger=logger,
    )
    labeled = []
    for fb in batches:
        _res, labels, _ = align_batch(fb, gmm, lex, topo)
        labeled.append((fb, labels))
    import numpy as _np
    from mogasr.am.neural import state_priors
    all_labels = _np.concatenate([_np.asarray(l).reshape(-1) for _, l in labeled])
    log_priors = state_priors(all_labels, topo.n_pdfs)

    ivec_rank = 0
    if args.ivector_dim > 0:
        from mogasr.am.ivector import train_ivector_extractor
        from mogasr.pipeline import append_ivectors

        extractor = train_ivector_extractor(
            batches, n_components=args.ivector_components,
            rank=args.ivector_dim,
        )
        aug = append_ivectors(batches, extractor)
        labeled = [(afb, labels) for afb, (_fb, labels) in zip(aug, labeled)]
        iv_ckpt = os.path.join(os.path.abspath(args.run_dir),
                               "ivector_extractor")
        save_checkpoint(iv_ckpt, {"ubm": extractor.ubm,
                                  "t": jnp.asarray(extractor.t_mat)})
        logger.log({"stage": "ivector_extractor",
                    "components": args.ivector_components,
                    "rank": args.ivector_dim, "ckpt": iv_ckpt})
        ivec_rank = args.ivector_dim

    tcfg = TrainConfig(
        nn_arch=args.arch, nn_hidden=args.hidden, nn_layers=args.layers,
        nn_experts=args.experts, lr=args.lr, num_nn_steps=args.steps,
    )
    model = build_model(args.arch, topo.n_pdfs, tcfg)
    state = init_train_state(model, tcfg, fcfg.feat_dim + ivec_rank,
                             jax.random.key(tcfg.seed))
    step_fn = make_train_step(model, tcfg, spec_augment=args.spec_augment)

    ckpt = os.path.join(os.path.abspath(args.run_dir), f"nn_{args.arch}")

    def tree_of(params):
        return {"params": params, "log_priors": jnp.asarray(log_priors)}

    with Timer() as t:
        i = 0
        while i < args.steps:
            for fb, labels in labeled:
                state, metrics = step_fn(state, fb.feats, fb.n_frames, labels)
                i += 1
                if i % 50 == 0:
                    logger.log({
                        "stage": "train_nn", "step": i,
                        "loss": float(metrics["loss"]),
                        "frame_acc": float(metrics["frame_acc"]),
                    })
                if args.save_every > 0 and i % args.save_every == 0:
                    save_checkpoint(ckpt, tree_of(state.params), step=i)
                if i >= args.steps:
                    break
    logger.log({"stage": "train_nn_done", "steps": i, "wall_sec": t.seconds,
                "final_loss": float(metrics["loss"]),
                "final_frame_acc": float(metrics["frame_acc"])})
    if args.seq_mmi_steps > 0:
        from mogasr.am.nn_seq import finetune_nn_mmi

        feat_batches = [fb for fb, _labels in labeled]
        new_params, mmi_hist = finetune_nn_mmi(
            feat_batches, lex, topo, model, state.params,
            jnp.asarray(log_priors), tcfg, steps=args.seq_mmi_steps,
            acoustic_scale=args.seq_mmi_scale, logger=logger,
        )
        state = state._replace(params=new_params)
        logger.log({"stage": "nn_mmi_done", "steps": args.seq_mmi_steps,
                    "mmi_per_frame_first": mmi_hist[0],
                    "mmi_per_frame_last": mmi_hist[-1]})
    if args.seq_smbr_steps > 0:
        from mogasr.am.nn_seq import finetune_nn_smbr

        new_params, smbr_hist = finetune_nn_smbr(
            labeled, lex, topo, model, state.params,
            jnp.asarray(log_priors), tcfg, steps=args.seq_smbr_steps,
            acoustic_scale=args.seq_mmi_scale, logger=logger,
        )
        state = state._replace(params=new_params)
        logger.log({"stage": "nn_smbr_done", "steps": args.seq_smbr_steps,
                    "acc_per_frame_first": smbr_hist[0],
                    "acc_per_frame_last": smbr_hist[-1]})
    seq_tuned = args.seq_mmi_steps > 0 or args.seq_smbr_steps > 0
    if seq_tuned and args.save_every > 0 and i % args.save_every == 0:
        # the CE loop already wrote step i, but MMI/sMBR fine-tuning mutated
        # the params afterwards — save them as a NEW step or they are lost
        save_checkpoint(ckpt, tree_of(state.params), step=i + 1)
    elif seq_tuned or not (args.save_every > 0 and i % args.save_every == 0):
        save_checkpoint(ckpt, tree_of(state.params), step=i)
    if args.average_last > 1:
        from mogasr.utils.checkpoint import average_checkpoints

        avg = average_checkpoints(ckpt, tree_of(state.params),
                                  last_k=args.average_last)
        save_checkpoint(ckpt, avg, step=i + 1)
        logger.log({"stage": "ckpt_average", "last_k": args.average_last,
                    "saved_step": i + 1})
    print(f"saved {args.arch} AM to {ckpt}")


if __name__ == "__main__":
    main()
