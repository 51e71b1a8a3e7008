"""Batched device delta tail == per-slot host StreamingFrontend tail.

Round-5 groundwork (mogasr/frontend/device_tail.py): the engines' measured
ceiling is the host-mediated feature path; this tests the delta half of
the device-resident replacement — same rolling-buffer trim policy, same
edge clamping, ragged per-slot schedules, slot reset on finalize.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from mogasr.config import FrontendConfig
from mogasr.frontend.device_tail import tail_init, tail_step
from mogasr.frontend.streaming import StreamingFrontend


@pytest.fixture(scope="module")
def cfg():
    return dataclasses.replace(FrontendConfig(), cmvn="none")


def _host_rows(cfg, schedule, rows):
    """Feed per-slot host tails; -> emitted feature matrix."""
    fe = StreamingFrontend(cfg)
    outs = []
    t = 0
    for n in schedule:
        outs.append(fe.absorb(rows[t : t + n]))
        t += n
    outs.append(fe.finalize_absorbed())
    return np.concatenate(outs, axis=0)


def test_device_tail_matches_host(cfg):
    """3 slots with different ragged schedules, one shared batched device
    tail — every slot's emitted rows equal its dedicated host tail."""
    rng = np.random.default_rng(0)
    F = 8
    schedules = [
        [8, 8, 8, 8],              # steady full chunks
        [3, 0, 7, 8, 1, 8],        # ragged, with an idle step
        [8, 2, 2, 2, 8, 5],        # mixed
    ]
    B = len(schedules)
    n_steps = max(len(s) for s in schedules)
    totals = [sum(s) for s in schedules]
    rows = [rng.standard_normal((t, cfg.base_dim)).astype(np.float32)
            for t in totals]

    state = tail_init(cfg, B, F)
    got = [[] for _ in range(B)]
    fed = [0] * B
    for i in range(n_steps):
        new = np.zeros((B, F, cfg.base_dim), np.float32)
        n_new = np.zeros(B, np.int32)
        for b, sched in enumerate(schedules):
            if i < len(sched):
                n = sched[i]
                new[b, :n] = rows[b][fed[b] : fed[b] + n]
                n_new[b] = n
                fed[b] += n
        state, out, n_out = tail_step(cfg, state, new, n_new)
        out = np.asarray(out)
        for b in range(B):
            if int(n_out[b]):
                got[b].append(out[b, : int(n_out[b])])
    # finalize all slots (flush the lookahead tail, reset carries)
    state, out, n_out = tail_step(
        cfg, state, np.zeros((B, F, cfg.base_dim), np.float32),
        np.zeros(B, np.int32), final=np.ones(B, bool))
    out = np.asarray(out)
    for b in range(B):
        if int(n_out[b]):
            got[b].append(out[b, : int(n_out[b])])

    for b, sched in enumerate(schedules):
        want = _host_rows(cfg, sched, rows[b])
        have = np.concatenate(got[b], axis=0)
        assert have.shape == want.shape, (b, have.shape, want.shape)
        np.testing.assert_allclose(have, want, rtol=1e-5, atol=1e-6,
                                   err_msg=f"slot {b}")
    # finalize reset the carries — slots are reusable
    assert int(np.asarray(state.valid).sum()) == 0
    assert int(np.asarray(state.off).sum()) == 0


def test_device_tail_slot_reuse_after_final(cfg):
    """A slot finalized mid-batch restarts cleanly while its neighbor keeps
    streaming — the masked reset is per-slot."""
    rng = np.random.default_rng(1)
    F = 6
    state = tail_init(cfg, 2, F)
    a = rng.standard_normal((18, cfg.base_dim)).astype(np.float32)
    b_rows = rng.standard_normal((24, cfg.base_dim)).astype(np.float32)

    def feed(state, rows_a, rows_b, final_a=False):
        new = np.zeros((2, F, cfg.base_dim), np.float32)
        n = np.zeros(2, np.int32)
        new[0, : len(rows_a)] = rows_a; n[0] = len(rows_a)
        new[1, : len(rows_b)] = rows_b; n[1] = len(rows_b)
        fin = np.asarray([final_a, False])
        return tail_step(cfg, state, new, n, final=fin)

    outs_a, outs_b = [], []
    state, out, n_out = feed(state, a[:6], b_rows[:6])
    outs_a.append(np.asarray(out)[0, : int(n_out[0])])
    outs_b.append(np.asarray(out)[1, : int(n_out[1])])
    # finalize slot 0 (6 more rows + flush), slot 1 keeps going
    state, out, n_out = feed(state, a[6:12], b_rows[6:12], final_a=True)
    outs_a.append(np.asarray(out)[0, : int(n_out[0])])
    outs_b.append(np.asarray(out)[1, : int(n_out[1])])
    # slot 0 RESTARTS with a fresh utterance (reuse a[12:18] as new audio)
    outs_a2 = []
    state, out, n_out = feed(state, a[12:18], b_rows[12:18])
    outs_a2.append(np.asarray(out)[0, : int(n_out[0])])
    outs_b.append(np.asarray(out)[1, : int(n_out[1])])
    state, out, n_out = feed(state, a[:0], b_rows[18:24], final_a=True)
    outs_a2.append(np.asarray(out)[0, : int(n_out[0])])
    outs_b.append(np.asarray(out)[1, : int(n_out[1])])

    want_a1 = _host_rows(cfg, [6, 6], a[:12])
    np.testing.assert_allclose(
        np.concatenate(outs_a), want_a1, rtol=1e-5, atol=1e-6)
    want_a2 = _host_rows(cfg, [6, 0], a[12:18])
    np.testing.assert_allclose(
        np.concatenate(outs_a2), want_a2, rtol=1e-5, atol=1e-6)
    # slot 1: continuous 24-frame stream in 6-row chunks, not yet final
    fe = StreamingFrontend(cfg)
    want_b = np.concatenate(
        [fe.absorb(b_rows[i : i + 6]) for i in range(0, 24, 6)], axis=0)
    np.testing.assert_allclose(
        np.concatenate(outs_b), want_b, rtol=1e-5, atol=1e-6)
