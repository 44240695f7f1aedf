"""Custom mention spaces with implicit-span expansion.

The reference's hardware tutorial expands part ranges like "PN100A-PN102A"
into the enumerated codes via ImplicitSpans carrying an expander_key
(/root/reference/tests/shared/hardware_spaces.py:13-146, MentionNgramsPart
164-241). This module provides the engine's equivalent as a pluggable
MentionSpace: user subclasses run inside the mention pandas UDF unchanged.
"""

from __future__ import annotations

import re
from typing import Iterator

from .mention_spaces import Ngrams
from .spans import ImplicitSpan, SentenceView, Span

_RANGE_RGX = re.compile(r"^([A-Z]{2})(\d{3})([A-C])-(?:[A-Z]{2})?(\d{3})([A-C])$")


def expand_part_range(text: str) -> Iterator[str]:
    """'PN100A-PN102A' -> PN100A, PN101A, PN102A (inclusive, same suffix)."""
    m = _RANGE_RGX.match(text)
    if not m:
        return
    prefix, lo, sfx_lo, hi, sfx_hi = m.groups()
    if sfx_lo != sfx_hi:
        return
    lo_i, hi_i = int(lo), int(hi)
    if hi_i < lo_i or hi_i - lo_i > 50:
        return
    for n in range(lo_i, hi_i + 1):
        yield f"{prefix}{n}{sfx_lo}"


class NgramsPartRange(Ngrams):
    """Ngrams space that additionally emits ImplicitSpans for part ranges.

    Each expanded code is an ImplicitSpan over the range token's chars with
    ``expander_key='part_range'`` and its enumeration position — identity
    and stable_id semantics match the reference's
    TemporaryImplicitSpanMention (implicit_span_mention.py:61-111).
    """

    def apply(self, sentence: SentenceView) -> Iterator[Span]:
        for span in super().apply(sentence):
            expanded = list(expand_part_range(span.get_span()))
            if expanded:
                for pos, code in enumerate(expanded):
                    yield ImplicitSpan(
                        sentence, span.char_start, span.char_end,
                        expanded_text=code, expander_key="part_range",
                        position=pos,
                    )
            else:
                yield span
