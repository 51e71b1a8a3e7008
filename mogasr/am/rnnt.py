"""RNN-Transducer (RNN-T): streaming-native sequence transduction.

Completes the end-to-end family beyond CTC (mogasr.am.ctc): the transducer
conditions each emission on the LABEL HISTORY through a prediction network,
removing CTC's conditional-independence assumption, and is the standard
architecture for streaming ASR.

Components (all Flax, lowered to XLA):

- encoder: any frame classifier body from mogasr.am.neural (the acoustic
  transcription network) producing [B, T, H_enc];
- prediction network: embedding + unidirectional LSTM over the label
  sequence (blank-free), [B, U] -> [B, U+1, H_pred] (position 0 = <sos>);
- joint network: broadcast-add + tanh + projection to V = n_labels + 1
  logits over the [B, T, U+1] lattice (blank LAST, matching ctc.py).

The transducer loss is the log-domain DP over the (t, u) lattice
(Graves 2012):

    alpha[t, u] = lse(alpha[t-1, u] + blank(t-1, u),
                      alpha[t, u-1] + emit(t, u-1))

implemented as a ``lax.scan`` over T whose carry is the alpha row [B, U+1];
the in-frame recursion over u is a second (inner) scan — both are
fixed-shape, padding-frozen, exactly the pattern of the CTC/FB scans.
``tests/test_rnnt.py`` checks the loss against an independent NumPy DP and
gradients against finite differences of that oracle.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mogasr.config import TrainConfig

NEG_INF = -1e30


# --------------------------------------------------------------------------
# Model
# --------------------------------------------------------------------------


class RnntPrediction(nn.Module):
    """Label-history network: embed + LSTM; input labels are blank-free."""

    n_labels: int
    hidden: int = 256
    embed: int = 128

    @nn.compact
    def __call__(self, labels: jax.Array) -> jax.Array:
        # labels: [B, U] (-1 padding). Prepend <sos> (index n_labels) so the
        # output at position u conditions on labels[:u]; output [B, U+1, H].
        B, U = labels.shape
        sos = jnp.full((B, 1), self.n_labels, jnp.int32)
        x = jnp.concatenate([sos, jnp.maximum(labels, 0).astype(jnp.int32)], axis=1)
        emb = nn.Embed(self.n_labels + 1, self.embed)(x)
        return nn.RNN(nn.OptimizedLSTMCell(self.hidden))(emb)


class RnntJoint(nn.Module):
    """Joint network: enc [B, T, He] x pred [B, U1, Hp] -> [B, T, U1, V]."""

    n_labels: int
    hidden: int = 256

    @nn.compact
    def __call__(self, enc: jax.Array, pred: jax.Array) -> jax.Array:
        e = nn.Dense(self.hidden, name="enc_proj")(enc)[:, :, None, :]
        p = nn.Dense(self.hidden, name="pred_proj")(pred)[:, None, :, :]
        return nn.Dense(self.n_labels + 1, name="out")(jnp.tanh(e + p))


class RnntModel(nn.Module):
    """Encoder + prediction + joint. Blank id = n_labels (last)."""

    n_labels: int
    enc_hidden: int = 256
    enc_layers: int = 2
    pred_hidden: int = 256
    joint_hidden: int = 256
    encoder_arch: str = "lstm"  # lstm (streaming) | blstm (offline)

    def setup(self):
        from mogasr.am.neural import BlstmAm, LstmAm

        cls = LstmAm if self.encoder_arch == "lstm" else BlstmAm
        # reuse the AM body; its final Dense yields the encoder features
        self.encoder = cls(
            n_pdfs=self.enc_hidden, hidden=self.enc_hidden, layers=self.enc_layers
        )
        self.prediction = RnntPrediction(self.n_labels, hidden=self.pred_hidden)
        self.joint = RnntJoint(self.n_labels, hidden=self.joint_hidden)

    def __call__(self, feats, n_frames, labels):
        enc = self.encoder(feats, n_frames)
        pred = self.prediction(labels)
        return self.joint(enc, pred)

    def encode(self, feats, n_frames):
        return self.encoder(feats, n_frames)


# --------------------------------------------------------------------------
# Loss
# --------------------------------------------------------------------------


@jax.jit
def rnnt_loss(
    logits: jax.Array,    # [B, T, U+1, V] joint outputs (softmax applied here)
    n_frames: jax.Array,  # [B]
    labels: jax.Array,    # [B, U] (-1 padding), blank-free
    n_labels: jax.Array,  # [B]
) -> jax.Array:
    """Per-utterance transducer NLL -log p(y|x), shape [B]. Blank = V-1."""
    B, T, U1, V = logits.shape
    U = U1 - 1
    logp = jax.nn.log_softmax(logits, axis=-1)
    blank = logp[..., V - 1]                                   # [B, T, U+1]
    safe = jnp.maximum(labels, 0).astype(jnp.int32)
    # emit(t, u) = log P(y_{u+1} | t, u): gather the TRUE label at each u
    emit = jnp.take_along_axis(
        logp[:, :, :U, :], safe[:, None, :, None], axis=3
    )[..., 0]                                                  # [B, T, U]
    u_idx = jnp.arange(U1, dtype=jnp.int32)
    valid_u = u_idx[None, :] <= n_labels[:, None]              # [B, U+1]

    blank_tm = jnp.transpose(blank, (1, 0, 2))                 # [T, B, U+1]
    emit_tm = jnp.transpose(emit, (1, 0, 2))                   # [T, B, U]

    def emit_row(alpha_prev_col, emit_t):
        """In-frame recursion: alpha[t, u] from alpha[t, u-1] (emit edge).

        alpha_prev_col: [B, U+1] the blank-edge terms alpha[t-1, u]+blank;
        returns the completed row alpha[t, :].
        """
        def inner(carry, inputs):
            # carry: alpha[t, u-1]; inputs: (horizontal base at u, emit(t, u-1))
            base_u, e = inputs
            a_u = jnp.logaddexp(base_u, carry + e)
            return a_u, a_u

        a0 = alpha_prev_col[:, 0]
        _, rest = jax.lax.scan(
            inner, a0, (alpha_prev_col[:, 1:].swapaxes(0, 1), emit_t.swapaxes(0, 1))
        )
        return jnp.concatenate([a0[:, None], rest.swapaxes(0, 1)], axis=1)

    # t = 0 row: only emit edges from alpha[0,0] = 0
    base0 = jnp.full((B, U1), NEG_INF).at[:, 0].set(0.0)
    alpha0 = emit_row(base0, emit_tm[0])
    alpha0 = jnp.where(valid_u, alpha0, NEG_INF)

    def step(alpha, inputs):
        blank_t1, emit_t, t = inputs  # blank at t-1, emit at t
        base = alpha + blank_t1       # vertical (time) edges
        new = emit_row(base, emit_t)
        new = jnp.where(valid_u, new, NEG_INF)
        active = (t < n_frames)[:, None]
        return jnp.where(active, new, alpha), None

    ts = jnp.arange(1, T)
    alpha_T, _ = jax.lax.scan(step, alpha0, (blank_tm[:-1], emit_tm[1:], ts))

    # total = alpha[T-1, U] + blank(T-1, U), with per-utterance T and U
    last_u = n_labels.astype(jnp.int32)
    a_final = jnp.take_along_axis(alpha_T, last_u[:, None], axis=1)[:, 0]
    t_last = jnp.maximum(n_frames - 1, 0)
    blank_last = jnp.take_along_axis(
        jnp.take_along_axis(
            blank, t_last[:, None, None], axis=1
        )[:, 0, :],
        last_u[:, None], axis=1,
    )[:, 0]
    return -(a_final + blank_last)


def rnnt_loss_np(logp: np.ndarray, labels: Sequence[int]) -> float:
    """Independent NumPy oracle: -log p(y|x) for ONE utterance.

    logp: [T, U+1, V] log-softmaxed joint outputs; blank = V-1.
    """
    T, U1, V = logp.shape
    U = len(labels)
    assert U1 >= U + 1
    alpha = np.full((T, U + 1), -np.inf)
    for t in range(T):
        for u in range(U + 1):
            cands = []
            if t == 0 and u == 0:
                cands.append(0.0)
            if t > 0:
                cands.append(alpha[t - 1, u] + logp[t - 1, u, V - 1])
            if u > 0:
                cands.append(alpha[t, u - 1] + logp[t, u - 1, labels[u - 1]])
            alpha[t, u] = np.logaddexp.reduce(cands) if cands else -np.inf
    return float(-(alpha[T - 1, U] + logp[T - 1, U, V - 1]))


# --------------------------------------------------------------------------
# Training
# --------------------------------------------------------------------------


class RnntTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def init_rnnt_train_state(
    model: RnntModel, cfg: TrainConfig, feat_dim: int, u_max: int, key
) -> RnntTrainState:
    from mogasr.am.train_nn import make_optimizer

    dummy_f = jnp.zeros((2, 8, feat_dim), jnp.float32)
    dummy_l = jnp.zeros((2, u_max), jnp.int32)
    params = model.init(key, dummy_f, jnp.asarray([8, 8]), dummy_l)
    opt = make_optimizer(cfg)
    return RnntTrainState(params, opt.init(params), jnp.zeros((), jnp.int32))


def make_rnnt_train_step(model: RnntModel, cfg: TrainConfig):
    from mogasr.am.train_nn import make_optimizer

    opt = make_optimizer(cfg)

    @jax.jit
    def train_step(state, feats, n_frames, labels, n_labels):
        def loss_fn(params):
            logits = model.apply(params, feats, n_frames, labels)
            nll = rnnt_loss(logits, n_frames, labels, n_labels)
            valid = (n_frames > 0) & (n_labels > 0)
            nv = jnp.maximum(jnp.sum(valid), 1)
            per = jnp.where(valid, nll / jnp.maximum(n_labels, 1), 0.0)
            return jnp.sum(per) / nv, jnp.sum(jnp.where(valid, nll, 0.0)) / nv

        (loss, mean_nll), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return RnntTrainState(params, opt_state, state.step + 1), {
            "loss": loss, "utt_nll": mean_nll,
        }

    return train_step


# --------------------------------------------------------------------------
# Decoding
# --------------------------------------------------------------------------


def rnnt_greedy_decode(
    model: RnntModel,
    params,
    feats: jax.Array,     # [B, T, D]
    n_frames: jax.Array,  # [B]
    max_symbols_per_frame: int = 4,
    max_symbols: Optional[int] = None,
) -> List[List[int]]:
    """Frame-synchronous greedy decode (host loop over frames).

    At each frame, emit argmax labels (advancing the prediction state) until
    blank wins or the per-frame cap hits, then move to the next frame. The
    caps make the loop finite without changing results on real posteriors
    (blank dominates after the cap in practice).

    The label history lives in ONE fixed [B, max_symbols] buffer so the
    prediction network compiles exactly once — a growing-history shape
    recompiles per emission, which is pathological through a remote
    compiler (measured: an effectively hung decode on the TPU tunnel).
    """
    enc = model.apply(params, feats, n_frames, method=RnntModel.encode)
    B = enc.shape[0]
    V = model.n_labels + 1
    blank = V - 1

    pred_def = RnntPrediction(model.n_labels, hidden=model.pred_hidden)
    pred_params = {"params": params["params"]["prediction"]}
    joint_def = RnntJoint(model.n_labels, hidden=model.joint_hidden)
    joint_params = {"params": params["params"]["joint"]}

    @jax.jit
    def pred_of(hist, lens):
        """hist [B, U] (-1 pad), lens [B] -> [B, H]: the prediction output
        at each stream's OWN position (index len(history); <sos> offsets by
        one, so that is the state conditioned on exactly its history)."""
        out = pred_def.apply(pred_params, hist)  # [B, U+1, H]
        return jnp.take_along_axis(out, lens[:, None, None], axis=1)[:, 0, :]

    @jax.jit
    def joint_of(enc_t, pred_t):  # [B, He], [B, Hp] -> [B, V]
        return joint_def.apply(
            joint_params, enc_t[:, None, :], pred_t[:, None, :]
        )[:, 0, 0, :]

    nf = np.asarray(n_frames)
    T = enc.shape[1]
    u_cap = int(max_symbols) if max_symbols is not None else min(2 * T, 400)
    hyps: List[List[int]] = [[] for _ in range(B)]
    u_hist = np.full((B, u_cap), -1, np.int32)  # fixed shape: ONE compile
    # prediction state is recomputed from history per emission (histories are
    # short at this scale; a carry-based LSTM stepper is the optimization)

    def pred_now():
        lens = np.asarray([len(h) for h in hyps], np.int32)
        return pred_of(jnp.asarray(u_hist), jnp.asarray(lens))

    pred_t = pred_now()
    for t in range(T):
        active = nf > t
        if not active.any():
            break
        for _ in range(max_symbols_per_frame):
            logits = np.asarray(joint_of(enc[:, t], pred_t))
            best = logits.argmax(-1)
            emit_mask = active & (best != blank) & np.asarray(
                [len(h) < u_cap for h in hyps]
            )
            if not emit_mask.any():
                break
            for b in np.nonzero(emit_mask)[0]:
                u_hist[b, len(hyps[b])] = int(best[b])
                hyps[b].append(int(best[b]))
            pred_t = pred_now()
    return hyps
