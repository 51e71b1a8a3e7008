"""Property-based fuzzing (hypothesis) of the native/oracle parity
contracts: FLAC encode->native-decode roundtrip on arbitrary PCM, native
C++ batch WER == Python DP on arbitrary token sequences, and the RNN-T
scan loss == NumPy oracle on arbitrary score tensors (fixed shapes — jit
compiles once; hypothesis varies the VALUES)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from mogasr.am import rnnt as R

FUZZ = settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@FUZZ
@given(
    pcm=arrays(np.int16, st.integers(1, 2000),
               elements=st.integers(-32768, 32767)),
    blocksize=st.sampled_from([256, 4096]),
)
def test_flac_roundtrip_fuzz(pcm, blocksize):
    from mogasr.data.audio import decode_flac_bytes
    from mogasr.data.flac_write import encode_flac

    blob = encode_flac(pcm.astype(np.int64), 16000, bits=16,
                       blocksize=blocksize)
    samples, sr, bits = decode_flac_bytes(blob)
    assert (sr, bits) == (16000, 16)
    np.testing.assert_array_equal(
        np.asarray(samples).reshape(-1), pcm.astype(np.int64))


@FUZZ
@given(
    data=st.lists(
        st.tuples(
            st.lists(st.sampled_from("abcdefg"), max_size=12),
            st.lists(st.sampled_from("abcdefg"), max_size=12),
        ),
        min_size=1, max_size=6,
    )
)
def test_native_wer_matches_python_fuzz(data):
    from mogasr.eval.wer import corpus_wer

    refs = [r for r, _ in data]
    hyps = [h for _, h in data]
    if all(len(r) == 0 for r in refs):
        return  # WER undefined with zero reference words
    w_native, c_native = corpus_wer(refs, hyps, native=True)
    w_py, c_py = corpus_wer(refs, hyps, native=False)
    assert w_native == w_py
    assert (c_native.substitutions, c_native.deletions,
            c_native.insertions) == (c_py.substitutions, c_py.deletions,
                                     c_py.insertions)


# fixed shapes so the scan loss compiles ONCE; hypothesis drives values
_B, _T, _U, _V = 2, 5, 3, 4


@FUZZ
@given(
    logits=arrays(np.float32, (_B, _T, _U + 1, _V),
                  elements=st.floats(-6, 6, width=32)),
    n_frames=arrays(np.int32, (_B,), elements=st.integers(1, _T)),
    n_labels=arrays(np.int32, (_B,), elements=st.integers(1, _U)),
    label_bits=arrays(np.int32, (_B, _U), elements=st.integers(0, _V - 2)),
)
def test_rnnt_loss_matches_oracle_fuzz(logits, n_frames, n_labels,
                                       label_bits):
    labels = np.where(
        np.arange(_U)[None, :] < n_labels[:, None], label_bits, -1
    ).astype(np.int32)
    got = np.asarray(R.rnnt_loss(
        jnp.asarray(logits), jnp.asarray(n_frames),
        jnp.asarray(labels), jnp.asarray(n_labels)))
    for b in range(_B):
        logp = np.asarray(jax.nn.log_softmax(
            jnp.asarray(logits[b, : n_frames[b]]), axis=-1))
        want = R.rnnt_loss_np(logp, list(labels[b, : n_labels[b]]))
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-4)
