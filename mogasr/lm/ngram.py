"""N-gram language models for decoding (host-side estimation, device arrays).

Adds bigram word-pair weighting to the token-passing decoder: the loop-state
machinery in mogasr.decoder keeps per-chain LM context exact (the loop state
is factored per chain, not collapsed — see decoder/lm_viterbi.py). Estimation
is add-alpha-smoothed counting over transcripts; silence is modeled as an
ordinary token (documented simplification vs LM-transparent silence).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np

BOS = "<s>"
EOS = "</s>"


@dataclasses.dataclass
class BigramLm:
    tokens: List[str]          # decoding tokens (chains), index == chain id
    pair_logp: np.ndarray      # [C, C]: log P(token c' | token c)
    init_logp: np.ndarray      # [C]:    log P(token c | <s>)
    final_logp: np.ndarray     # [C]:    log P(</s> | token c)

    @property
    def n_tokens(self) -> int:
        return len(self.tokens)


def estimate_bigram(
    transcripts: Sequence[Sequence[str]],
    tokens: Sequence[str],
    alpha: float = 0.5,
) -> BigramLm:
    """Add-alpha bigram over the given token list (unknown words skipped)."""
    tokens = list(tokens)
    idx = {t: i for i, t in enumerate(tokens)}
    C = len(tokens)
    pair = np.full((C, C), alpha, np.float64)
    init = np.full(C, alpha, np.float64)
    final = np.full(C, alpha, np.float64)
    for words in transcripts:
        seq = [idx[w] for w in words if w in idx]
        if not seq:
            continue
        init[seq[0]] += 1
        for a, b in zip(seq, seq[1:]):
            pair[a, b] += 1
        final[seq[-1]] += 1
    tiny = 1e-30  # alpha=0 rows: unseen events get log(0) ~ -inf without warnings
    pair_logp = np.log(np.maximum(pair, tiny)) - np.log(
        np.maximum(pair.sum(1, keepdims=True) + final.reshape(-1, 1), tiny)
    )
    init_logp = np.log(np.maximum(init, tiny)) - np.log(max(init.sum(), tiny))
    final_logp = np.log(np.maximum(final, tiny)) - np.log(np.maximum(pair.sum(1) + final, tiny))
    return BigramLm(
        tokens=tokens,
        pair_logp=pair_logp.astype(np.float32),
        init_logp=init_logp.astype(np.float32),
        final_logp=final_logp.astype(np.float32),
    )


def uniform_bigram(tokens: Sequence[str]) -> BigramLm:
    """LM with uniform transitions — decodes identically to the LM-free
    unigram loop graph with matching priors (tested equivalence)."""
    C = len(tokens)
    u = np.full((C, C), -np.log(C), np.float32)
    return BigramLm(
        tokens=list(tokens),
        pair_logp=u,
        init_logp=np.full(C, -np.log(C), np.float32),
        final_logp=np.zeros(C, np.float32),
    )
