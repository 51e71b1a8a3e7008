"""Trained-system bundle: self-contained save/load of a deployable ASR system.

A "system" is everything a decoder needs beyond code: the GMM parameters, the
lexicon, the (possibly transition-re-estimated) HMM topology, the optional
tied-triphone table, the front-end configuration it was trained with, and
free-form metadata (training corpus description, held-out WER, ...).

This complements the orbax training checkpoints (utils/checkpoint.py): orbax
owns in-training state (optimizer, iteration counters); a bundle is the
portable export artifact — plain ``npz`` + ``json``, no framework state, so
bench.py and the CLIs can load the exact system that was evaluated
(round-2 requirement: throughput and WER must be measured on the SAME model).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from mogasr.config import FrontendConfig
from mogasr.hmm.lexicon import Lexicon, make_lexicon
from mogasr.hmm.topology import Topology
from mogasr.hmm.triphone import TiedTriphones

_FORMAT_VERSION = 1


def save_system(
    path: str,
    gmm,
    topo: Topology,
    fcfg: FrontendConfig,
    tied: Optional[TiedTriphones] = None,
    meta: Optional[Dict[str, Any]] = None,
) -> None:
    """Write ``gmm.npz`` + ``system.json`` under ``path`` (atomic-ish)."""
    os.makedirs(path, exist_ok=True)
    np.savez(
        os.path.join(path, "gmm.npz"),
        weights=np.asarray(gmm.weights, np.float32),
        means=np.asarray(gmm.means, np.float32),
        vars=np.asarray(gmm.vars, np.float32),
    )
    lex = topo.lexicon
    doc: Dict[str, Any] = {
        "format_version": _FORMAT_VERSION,
        "lexicon": {
            "phones": list(lex.phones),
            "prons": {w: list(lex.prons[w]) for w in lex.words},
            "variants": {
                w: [list(v) for v in vs] for w, vs in lex.variants.items()
            },
        },
        "topology": {
            "states_per_phone": topo.states_per_phone,
            "sil_states": topo.sil_states,
            "self_loop_logp": topo.self_loop_logp,
            "advance_logp": topo.advance_logp,
            "sil_self_loop_logp": topo.sil_self_loop_logp,
            "sil_advance_logp": topo.sil_advance_logp,
            "per_phone_self_prob": list(topo.per_phone_self_prob),
        },
        "frontend": dataclasses.asdict(fcfg),
        "tied": None,
        "meta": dict(meta or {}),
    }
    if tied is not None:
        doc["tied"] = {
            "n_pdfs": tied.n_pdfs,
            "tying": [[l, c, r, k, pdf] for (l, c, r, k), pdf in tied.tying.items()],
            "backoff": [[c, k, pdf] for (c, k), pdf in tied.backoff.items()],
        }
    tmp = os.path.join(path, "system.json.tmp")
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, os.path.join(path, "system.json"))


def load_system(path: str):
    """Load a bundle -> (gmm, topo, fcfg, tied_or_None, meta).

    The GmmSet is returned with device arrays (jnp) ready for scoring.
    """
    import jax.numpy as jnp

    from mogasr.am.gmm import GmmSet

    with open(os.path.join(path, "system.json")) as f:
        doc = json.load(f)
    if doc.get("format_version") != _FORMAT_VERSION:
        raise ValueError(f"unknown bundle format {doc.get('format_version')!r}")

    z = np.load(os.path.join(path, "gmm.npz"))
    gmm = GmmSet(
        jnp.asarray(z["weights"]), jnp.asarray(z["means"]), jnp.asarray(z["vars"])
    )

    lx = doc["lexicon"]
    lex = make_lexicon(
        {w: p for w, p in lx["prons"].items()}, extra_phones=lx["phones"]
    )
    if tuple(lex.phones) != tuple(lx["phones"]):
        raise ValueError(
            "phone inventory mismatch on load — pdf ids would be scrambled: "
            f"{lex.phones} vs {lx['phones']}"
        )
    if lx.get("variants"):
        lex = dataclasses.replace(
            lex,
            variants={
                w: tuple(tuple(v) for v in vs) for w, vs in lx["variants"].items()
            },
        )
    t = doc["topology"]
    topo = Topology(
        lexicon=lex,
        states_per_phone=t["states_per_phone"],
        sil_states=t["sil_states"],
        self_loop_logp=t["self_loop_logp"],
        advance_logp=t["advance_logp"],
        sil_self_loop_logp=t["sil_self_loop_logp"],
        sil_advance_logp=t["sil_advance_logp"],
        per_phone_self_prob=tuple(t["per_phone_self_prob"]),
    )
    tied = None
    if doc.get("tied"):
        td = doc["tied"]
        tied = TiedTriphones(
            topo=topo,
            tying={(l, c, r, k): pdf for l, c, r, k, pdf in td["tying"]},
            backoff={(c, k): pdf for c, k, pdf in td["backoff"]},
            n_pdfs=td["n_pdfs"],
        )
    fcfg = FrontendConfig(**doc["frontend"])
    return gmm, topo, fcfg, tied, doc.get("meta", {})
