"""Mention spaces: span generators over sentences / contexts.

Semantics-parity with /root/reference/src/fonduer/candidates/mentions.py:
``Ngrams`` yields all n-grams of a sentence by char offset **longest-first**
(reverse n order, mentions.py:86-88) with per-sentence dedup and optional
unigram re-splitting on split_tokens (mentions.py:100-125). The longest-first
order is what makes matcher longest-match-only pruning correct, so the space
and matcher always run fused per sentence.
"""

from __future__ import annotations

import re
from typing import Collection, Iterator, List, Optional, Set

from .spans import SentenceView, Span


class MentionSpace:
    def apply(self, x) -> Iterator:
        raise NotImplementedError


class Ngrams(MentionSpace):
    """All n-grams (n_min <= n <= n_max) of a sentence, longest first."""

    def __init__(self, n_min: int = 1, n_max: int = 5,
                 split_tokens: Collection[str] = ()) -> None:
        self.n_min = n_min
        self.n_max = n_max
        self.split_rgx: Optional[str] = (
            r"(" + r"|".join(map(re.escape, sorted(split_tokens, reverse=True))) + r")"
            if split_tokens else None
        )

    def apply(self, sentence: SentenceView) -> Iterator[Span]:
        offsets: List[int] = sentence.char_offsets
        words: List[str] = sentence.words
        L = len(offsets)
        if self.n_min == 1 and self.n_max == 1 and self.split_rgx is None:
            # unigram fast path: token spans are distinct by construction,
            # so the dedup set is pure overhead (the dominant case for
            # single-token matchers)
            for i in range(L):
                start = offsets[i]
                yield Span(sentence, start, start + len(words[i]) - 1)
            return
        seen: Set[Span] = set()
        for n in range(self.n_max, self.n_min - 1, -1):  # longest first
            for i in range(L - n + 1):
                start = offsets[i]
                end = offsets[i + n - 1] + len(words[i + n - 1]) - 1
                ts = Span(sentence, start, end)
                if ts not in seen:
                    seen.add(ts)
                    yield ts
                if (
                    n == 1
                    and self.n_max >= 1
                    and self.n_min <= 1
                    and self.split_rgx is not None
                    and end - start > 0
                ):
                    # Re-split the unigram on split_tokens.
                    # DELIBERATE DEVIATION from reference mentions.py:100-125,
                    # which passes token-relative indices straight to the span
                    # constructor — sub-spans are only offset-correct there
                    # when the token starts the sentence. We anchor at the
                    # token's sentence offset so every sub-span's text and
                    # stable_id are correct.
                    text = sentence.text[start - offsets[0]: end - offsets[0] + 1]
                    start_idxs = [0]
                    end_idxs = []
                    for mobj in re.finditer(self.split_rgx, text):
                        start_idxs.append(mobj.end())
                        end_idxs.append(mobj.start())
                    end_idxs.append(len(text))
                    for si in start_idxs:
                        for ei in end_idxs:
                            if si < ei:
                                ts = Span(sentence, start + si, start + ei - 1)
                                if ts not in seen and ts.get_span():
                                    seen.add(ts)
                                    yield ts


class MentionNgrams(Ngrams):
    """Ngrams over every sentence of a document (the per-document grouping is
    implicit in the Spark stage, which iterates a document's sentences in
    position order)."""


class MentionSentences(MentionSpace):
    """The whole sentence as one span."""

    def apply(self, sentence: SentenceView) -> Iterator[Span]:
        if sentence.words:
            yield Span(sentence, 0, len(sentence.text) - 1)
