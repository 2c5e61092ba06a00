"""Token vocabulary with sentencepiece-style detokenization.

Parity target: `/root/reference/utils/vocab.py:5-64` (same on-disk format:
one "token id" pair per line; `<unk>` fallback; BPE `▁` word joining).
Torch-free.
"""

from __future__ import annotations

from typing import Iterable, List


class Vocab:
    def __init__(self, vocab_path: str):
        with open(vocab_path, encoding="utf-8") as f:
            lines = [line.strip() for line in f if line.strip()]

        self.i2t = {}
        self.t2i = {}
        for line in lines:
            token, idx = line.split()
            self.i2t[int(idx)] = token
            self.t2i[token] = int(idx)

        self.unk_id = self.t2i["<unk>"]

    def __len__(self) -> int:
        return len(self.i2t)

    def id2token(self, idx: int) -> str:
        return self.i2t[int(idx)]

    def ids2tokens(self, ids: Iterable[int]) -> List[str]:
        return [self.id2token(i) for i in ids]

    def ids2words(self, ids: Iterable[int]) -> List[str]:
        return self.subwords_to_words(self.ids2tokens(ids))

    def ids2text(self, ids: Iterable[int]) -> str:
        return " ".join(self.ids2words(ids))

    def token2id(self, token: str) -> int:
        return self.t2i.get(token, self.unk_id)

    def tokens2ids(self, tokens: Iterable[str]) -> List[int]:
        return [self.token2id(t) for t in tokens]

    @staticmethod
    def subwords_to_words(subwords: List[str]) -> List[str]:
        """Join sentencepiece BPE pieces (`▁` marks word starts; `<...>`
        specials are standalone words).  Same joining rule as the reference
        (`utils/vocab.py:45-64`)."""
        words: List[str] = []
        cur = ""
        for sw in subwords:
            if sw[0] == "▁" or sw[0] == "<" or (cur and cur[-1] == ">"):
                if cur:
                    words.append(cur)
                cur = sw[1:] if sw[0] == "▁" else sw
            else:
                cur += sw
        if cur:
            words.append(cur)
        return words
