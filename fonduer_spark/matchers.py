"""Matcher algebra: composable boolean predicates over spans.

Semantics-parity with the reference's matcher combinators
(/root/reference/src/fonduer/candidates/matchers.py). Every matcher exposes
``f(span) -> bool`` and ``apply(span_iter)`` with **longest-match-only**
pruning: once a span matches, any later span contained in it is suppressed
(matchers.py:58-71) — which relies on the span generator yielding longer
n-grams first. Matchers run fused with the span generator inside one
pandas-UDF batch (never decomposed into a join — the pruning is
order-sensitive, see SURVEY.md §2.4).
"""

from __future__ import annotations

import re
from typing import Callable, Iterator, Optional, Sequence, Set

from .spans import Span

WORDS = "words"


class Matcher:
    """Base combinator. ``children`` compose; ``longest_match_only`` prunes."""

    longest_match_only_default = True

    def __init__(self, *children: "Matcher", **opts) -> None:
        self.children = children
        self.longest_match_only: bool = opts.pop(
            "longest_match_only", self.longest_match_only_default
        )
        self._init(**opts)

    def _init(self, **opts) -> None:
        if opts:
            raise TypeError(f"Unsupported options: {sorted(opts)}")

    def _f(self, m: Span) -> bool:
        return True

    def f(self, m: Span) -> bool:
        if len(self.children) == 0:
            return self._f(m)
        if len(self.children) == 1:
            return self._f(m) and self.children[0].f(m)
        raise ValueError(
            f"{type(self).__name__} takes at most one child matcher"
        )

    def apply(self, mentions: Iterator[Span]) -> Iterator[Span]:
        seen: Set[Span] = set()
        for m in mentions:
            if self.f(m) and (
                not self.longest_match_only or not any(m in s for s in seen)
            ):
                if self.longest_match_only:
                    seen.add(m)
                yield m


class DoNothingMatcher(Matcher):
    """Accepts everything."""


class DictionaryMatch(Matcher):
    """Span text ∈ dictionary (case-fold / stem / inverse options)."""

    def _init(self, d: Sequence[str] = (), ignore_case: bool = True,
              inverse: bool = False, attrib: str = WORDS, stemmer=None) -> None:
        if not d:
            raise ValueError("DictionaryMatch requires d=<list of strings>")
        self.ignore_case = ignore_case
        self.inverse = inverse
        self.attrib = attrib
        self.stemmer = stemmer
        words = (w.lower() if ignore_case else w for w in d)
        self.d = frozenset(self._stem(w) for w in words)

    def _stem(self, w: str) -> str:
        if self.stemmer is None:
            return w
        try:
            return self.stemmer.stem(w)
        except UnicodeDecodeError:
            return w

    def _f(self, m: Span) -> bool:
        p = m.get_attrib_span(self.attrib)
        if self.ignore_case:
            p = p.lower()
        p = self._stem(p)
        return self.inverse ^ (p in self.d)


class LambdaFunctionMatcher(Matcher):
    """Arbitrary user predicate; longest_match_only defaults to False
    (reference matchers.py:125-155)."""

    longest_match_only_default = False

    def _init(self, func: Optional[Callable[[Span], bool]] = None) -> None:
        if func is None:
            raise ValueError("LambdaFunctionMatcher requires func=...")
        self.func = func

    def _f(self, m: Span) -> bool:
        return bool(self.func(m))


class Union(Matcher):
    """Logical OR of child matchers."""

    def f(self, m: Span) -> bool:
        return any(c.f(m) for c in self.children)


class Intersect(Matcher):
    """Logical AND of child matchers."""

    def f(self, m: Span) -> bool:
        return all(c.f(m) for c in self.children)


class Inverse(Matcher):
    """Logical NOT of a single child matcher."""

    def __init__(self, *children: Matcher, **opts) -> None:
        if len(children) != 1:
            raise ValueError("Inverse takes exactly one child matcher")
        super().__init__(*children, **opts)

    def f(self, m: Span) -> bool:
        return not self.children[0].f(m)


class Concat(Matcher):
    """Matches spans splitting at a word boundary into left/right child
    matches (reference matchers.py:211-280; word-index splits only)."""

    def _init(self, permutations: bool = False, left_required: bool = True,
              right_required: bool = True, ignore_sep: bool = True,
              sep: str = " ") -> None:
        self.permutations = permutations
        self.left_required = left_required
        self.right_required = right_required
        self.ignore_sep = ignore_sep
        self.sep = sep

    def f(self, m: Span) -> bool:
        if len(self.children) != 2:
            raise ValueError("Concat takes exactly two child matchers")
        if not self.left_required and self.children[1].f(m):
            return True
        if not self.right_required and self.children[0].f(m):
            return True
        for wsplit in range(m.get_word_start_index() + 1, m.get_word_end_index() + 1):
            csplit = m._word_to_char_index(wsplit) - m.char_start
            if self.ignore_sep or m.get_span()[csplit - 1] == self.sep:
                m1 = m[: csplit - len(self.sep)]
                m2 = m[csplit:]
                if self.children[0].f(m1) and self.children[1].f(m2):
                    return True
                if self.permutations and self.children[1].f(m1) and self.children[0].f(m2):
                    return True
        return False


class _RegexMatch(Matcher):
    def _init(self, rgx: Optional[str] = None, ignore_case: bool = True,
              attrib: str = WORDS, sep: str = "", search: bool = False,
              full_match: bool = True) -> None:
        if rgx is None:
            raise ValueError("Regex matchers require rgx=...")
        self.ignore_case = ignore_case
        self.attrib = attrib
        self.sep = sep
        self.search = search
        self.full_match = full_match
        # Group before anchoring so `$` binds the whole alternation
        # (reference matchers.py:306-317).
        if full_match and not rgx.endswith("$"):
            rgx = "(" + rgx + ")$"
        self.r = re.compile(rgx, flags=(re.I if ignore_case else 0) | re.UNICODE)


class RegexMatchSpan(_RegexMatch):
    """Regex over the concatenated span text (match or search)."""

    def _f(self, m: Span) -> bool:
        text = m.get_attrib_span(self.attrib, sep=self.sep)
        hit = self.r.search(text) if self.search else self.r.match(text)
        return hit is not None


class RegexMatchEach(_RegexMatch):
    """Regex must match every token of the span (attrib selectable)."""

    def _f(self, m: Span) -> bool:
        tokens = m.get_attrib_tokens(self.attrib)
        return bool(tokens) and all(self.r.match(str(t)) is not None for t in tokens)


def _ner_matcher(rgx: str):
    class _M(RegexMatchEach):
        def __init__(self, *children: Matcher, **kwargs) -> None:
            kwargs["attrib"] = "ner_tags"
            kwargs["rgx"] = rgx
            super().__init__(*children, **kwargs)

    return _M


# NER-tag conveniences (degrade to no-matches under SimpleParser whose
# ner_tags are empty strings — same as the reference without spaCy).
PersonMatcher = _ner_matcher("PERSON")
LocationMatcher = _ner_matcher("GPE|LOC")
OrganizationMatcher = _ner_matcher("NORG|ORG")
DateMatcher = _ner_matcher("DATE")
NumberMatcher = _ner_matcher("CARDINAL|QUANTITY")
MiscMatcher = _ner_matcher("MISC")
PersonMatcher.__name__ = "PersonMatcher"
LocationMatcher.__name__ = "LocationMatcher"
OrganizationMatcher.__name__ = "OrganizationMatcher"
DateMatcher.__name__ = "DateMatcher"
NumberMatcher.__name__ = "NumberMatcher"
MiscMatcher.__name__ = "MiscMatcher"


class LambdaFunctionFigureMatcher(Matcher):
    """Predicate over figure mentions (dict rows)."""

    longest_match_only_default = False

    def _init(self, func: Optional[Callable] = None) -> None:
        if func is None:
            raise ValueError("LambdaFunctionFigureMatcher requires func=...")
        self.func = func

    def _f(self, m) -> bool:  # m is a figure row mapping
        return bool(self.func(m))
