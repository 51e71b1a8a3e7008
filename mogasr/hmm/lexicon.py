"""Phone set and pronunciation lexicon.

Host-side (SURVEY.md §1 L3: graph building happens on host, device arrays are
handed to the jitted decoder). Supports the bundled synthetic lexicon and
Kaldi/CMUdict-style lexicon text files (``WORD ph1 ph2 ...``) for real
corpora such as LibriSpeech.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

SIL = "sil"
EPS = "<eps>"
UNK = "<unk>"


@dataclasses.dataclass(frozen=True)
class Lexicon:
    phones: Tuple[str, ...]              # phone inventory, SIL first
    words: Tuple[str, ...]               # vocabulary, sorted
    prons: Dict[str, Tuple[str, ...]]    # word -> phone sequence

    @property
    def n_phones(self) -> int:
        return len(self.phones)

    def phone_id(self, p: str) -> int:
        return self.phones.index(p)

    @property
    def sil_id(self) -> int:
        return self.phones.index(SIL)

    def word_phone_ids(self, word: str) -> List[int]:
        idx = {p: i for i, p in enumerate(self.phones)}
        return [idx[p] for p in self.prons[word]]

    def words_to_phone_ids(
        self,
        words: Sequence[str],
        interword_sil: bool = True,
        edge_sil: bool = True,
        oov: str = "error",  # error | skip | sil
    ) -> List[int]:
        """Expand a word sequence to phone ids with optional silences.

        oov: out-of-vocabulary handling — raise, drop the word, or model it
        as silence (the monophone-system stand-in for <unk>/<spn>).
        """
        idx = {p: i for i, p in enumerate(self.phones)}
        out: List[int] = [idx[SIL]] if edge_sil else []
        for i, w in enumerate(words):
            if w in self.prons:
                out.extend(idx[p] for p in self.prons[w])
            elif oov == "error":
                raise KeyError(f"word {w!r} not in lexicon (pass oov='skip' or 'sil')")
            elif oov == "sil":
                out.append(idx[SIL])
            # skip: drop silently
            if interword_sil and i < len(words) - 1:
                out.append(idx[SIL])
        if edge_sil:
            out.append(idx[SIL])
        return out


def make_lexicon(prons: Dict[str, Sequence[str]], extra_phones: Iterable[str] = ()) -> Lexicon:
    phones = {SIL}
    for ps in prons.values():
        phones.update(ps)
    phones.update(extra_phones)
    ordered = (SIL,) + tuple(sorted(phones - {SIL}))
    return Lexicon(
        phones=ordered,
        words=tuple(sorted(prons)),
        prons={w: tuple(ps) for w, ps in prons.items()},
    )


def synthetic_lexicon() -> Lexicon:
    from mogasr.data.synthetic import LEXICON

    return make_lexicon(LEXICON)


def load_lexicon(path: str) -> Lexicon:
    """Parse a Kaldi-style lexicon.txt: 'WORD phone phone ...' per line.

    Words are lowercased to match the corpus loaders (LibriSpeech transcripts
    are uppercase, cli.common lowercases them) — a case mismatch would
    silently turn every word OOV.
    """
    import re

    prons: Dict[str, Tuple[str, ...]] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                # CMUdict-style alternate-pronunciation markers: "WORD(2)"
                word = re.sub(r"\(\d+\)$", "", parts[0]).lower()
                if word not in prons:  # first pron wins
                    prons[word] = tuple(parts[1:])
    return make_lexicon(prons)
