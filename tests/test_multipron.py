"""Multi-pronunciation lexicon tests: loading, graph expansion, decoding.

A word with an alternate pronunciation must be recoverable when spoken with
that variant — the single-pron graph has no path for it, the multi-pron graph
does (one chain per variant, shared word label, uniform pron prior).
"""

import numpy as np
import pytest

from mogasr import pipeline as pipe
from mogasr.config import DecodeConfig
from mogasr.data.synthetic import LEXICON, synth_utterance
from mogasr.decoder.lm_viterbi import path_to_tokens_lm, viterbi_lm
from mogasr.hmm.lexicon import load_lexicon, make_lexicon_multi
from mogasr.lm.ngram import uniform_bigram


def test_load_lexicon_keeps_variants(tmp_path):
    p = tmp_path / "lexicon.txt"
    p.write_text(
        "THE dh ah\nTHE(2) dh iy\nCAT k ae t\nTHE dh ah\n"  # dup pron dropped
    )
    lex = load_lexicon(str(p))
    assert lex.variants["the"] == (("dh", "ah"), ("dh", "iy"))
    assert lex.prons["the"] == ("dh", "ah")  # primary = first listed
    assert lex.variants["cat"] == (("k", "ae", "t"),)
    assert lex.word_variant_phone_ids("the")[1] == [
        lex.phone_id("dh"), lex.phone_id("iy")
    ]


@pytest.fixture(scope="module")
def multipron_system(mini_system):
    """The shared mini system (full phone coverage so decode failures isolate
    the multi-pron machinery; 'fish' has the alternate pron f-iy-sh) plus two
    eval utterances that SPEAK the variant."""
    from mogasr.config import BatchConfig, FrontendConfig

    mlex, topo, gmm, _vocab = mini_system
    alt_lex = dict(LEXICON)
    alt_lex["fish"] = ["f", "iy", "sh"]
    utts = [
        synth_utterance("alt-0", ["fish", "cat"], seed=7, lexicon=alt_lex),
        synth_utterance("alt-1", ["see", "fish"], seed=8, lexicon=alt_lex),
    ]
    fbs = pipe.featurize(
        [(u.utt_id, u.wave, u.words) for u in utts],
        FrontendConfig(), BatchConfig(batch_size=2, bucket_boundaries=(400,)),
    )
    return mlex, topo, gmm, fbs


def test_multipron_graph_recovers_alternate_pron(multipron_system):
    mlex, topo, gmm, fbs = multipron_system
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=0.0)
    g_single = pipe.word_decode_graph(mlex, topo, dcfg)
    g_multi, pron_logp = pipe.word_decode_graph_multi(mlex, topo, dcfg)
    # one extra chain for the fish variant, labels repeat the word
    assert len(g_multi.labels) == len(g_single.labels) + 1
    assert g_multi.labels.count("fish") == 2
    assert pron_logp.shape == (len(g_multi.labels),)

    import jax.numpy as jnp
    from mogasr.decoder import viterbi as vit
    from mogasr.hmm import graph as gr

    for fb in fbs:
        scores = pipe.score_batch(fb.feats, gmm)
        hyp_m = pipe.decode_batch(fb, scores, g_multi, dcfg)
        for b in range(fb.size):
            ref = [w for w in fb.words[b]]
            assert hyp_m[b] == ref, (hyp_m[b], ref)
        # Variant chains can only help: the multi-pron best path never loses
        # more than the split pron prior (log 2) vs the single-pron graph,
        # and for at least one alt-pron utterance the variant chain wins
        # outright (f-iy-sh audio routed through its own chain).
        def best_score(g):
            gs = {k: jnp.asarray(v) for k, v in gr.batch_graphs(
                [g] * scores.shape[0]).items()}
            return vit.viterbi(
                scores, gs, fb.n_frames, acoustic_scale=1.0,
                with_backtrace=False,
            ).score

        s_multi = np.asarray(best_score(g_multi))[: fb.size]
        s_single = np.asarray(best_score(g_single))[: fb.size]
        assert (s_multi >= s_single - np.log(2) - 1e-3).all(), (s_multi, s_single)
        assert (s_multi > s_single + 1.0).any(), (s_multi, s_single)


def test_multipron_lm_decode_matches_plain_with_uniform_lm(multipron_system):
    """Uniform bigram + multi-pron graph == plain Viterbi on the same graph
    (matching priors) — validates the word-level LM contraction over graphs
    with repeated labels."""
    mlex, topo, gmm, fbs = multipron_system
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=0.0)
    g_multi, pron_logp = pipe.word_decode_graph_multi(mlex, topo, dcfg)
    words = sorted(set(g_multi.labels))
    lm = uniform_bigram(words)
    # plain graph priors are -log(W) per word (split over variants); uniform
    # LM supplies the same -log(W) via init/pair, variants via pron_logp
    for fb in fbs:
        scores = pipe.score_batch(fb.feats, gmm)
        base = pipe.decode_batch(fb, scores, g_multi, dcfg, drop_tokens=())
        res = viterbi_lm(
            scores, g_multi, lm, fb.n_frames, acoustic_scale=1.0,
            chain_entry_logp=pron_logp,
        )
        toks = path_to_tokens_lm(res, g_multi)
        assert toks[: fb.size] == base[: fb.size]


def test_multipron_lm_decode_recovers_alternate(multipron_system):
    mlex, topo, gmm, fbs = multipron_system
    dcfg = DecodeConfig(acoustic_scale=1.0, word_insertion_penalty=0.0)
    g_multi, pron_logp = pipe.word_decode_graph_multi(mlex, topo, dcfg)
    lm = uniform_bigram(sorted(set(g_multi.labels)))
    for fb in fbs:
        scores = pipe.score_batch(fb.feats, gmm)
        res = viterbi_lm(
            scores, g_multi, lm, fb.n_frames, acoustic_scale=1.0,
            chain_entry_logp=pron_logp,
        )
        toks = path_to_tokens_lm(res, g_multi)
        for b in range(fb.size):
            hyp = [w for w in toks[b] if w != "<sil>"]
            assert hyp == list(fb.words[b]), (hyp, fb.words[b])
