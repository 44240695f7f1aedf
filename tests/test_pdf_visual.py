"""PDF visual parser: bbox-XML word extraction, 3-pass linking, cogrouped
coordinate attach (reference pdf_visual_parser.py; poppler gated)."""

import pytest

from fonduer_spark.pdf_visual import (
    _editdist, attach_pdf_coordinates, extract_pdf_words, link_word_lists,
    pdftotext_bbox_words)

XML = """
<page width="612.0" height="792.0">
 <block xmin="10.0" ymin="100.0" xmax="300.0" ymax="140.0">
  <line xmin="10.0" ymin="100.5" xmax="300.0" ymax="112.9">
   <word xmin="10.2" ymin="100.5" xmax="60.9" ymax="112.9">Rated</word>
   <word xmin="70.0" ymin="100.5" xmax="110.0" ymax="112.9">(85)</word>
  </line>
 </block>
 <block xmin="10.0" ymin="20.0" xmax="300.0" ymax="60.0">
  <line xmin="10.0" ymin="20.0" xmax="300.0" ymax="32.0">
   <word xmin="10.0" ymin="20.0" xmax="80.0" ymax="32.0">PN100A</word>
  </line>
 </block>
</page>
"""


def test_bbox_xml_words_split_sort_and_truncate():
    rows = pdftotext_bbox_words(XML, 1)
    # block sort: the ymin=20 block comes first despite document order
    assert [r["word"] for r in rows] == ["PN100A", "Rated", "(", "85", ")"]
    # separator splitting shares the raw word's bbox; ints are truncated
    r85 = rows[3]
    assert (r85["left"], r85["right"]) == (70, 110)
    assert (r85["top"], r85["bottom"]) == (100, 112)  # line-level y, int()
    assert all(r["page"] == 1 for r in rows)


def test_editdist():
    assert _editdist("kitten", "sitting") == 3
    assert _editdist("", "abc") == 3
    assert _editdist("same", "same") == 0


def test_link_word_lists_three_passes():
    # exact duplicates pair positionally; '85' links to pdf '85.' via the
    # containment shortcut; 'PN10OA' (OCR-style typo) via edit distance
    html = ["the", "part", "PN100A", "is", "rated", "85", "the", "end"]
    pdf = ["the", "part", "PN10OA", "is", "rated", "85.", "the", "end"]
    links = link_word_lists(html, pdf, search_max=6)
    assert links[0] == 0 and links[6] == 6      # duplicate 'the' in order
    assert links[5] == 5                         # containment: 85 in 85.
    assert links[2] == 2                         # fuzzy edit-distance
    assert links == list(range(8))


def test_link_total_even_with_garbage():
    links = link_word_lists(["aaa", "zzz"], ["bbb"], search_max=4)
    assert links == [0, 0]  # always total, like the reference


def test_extract_pdf_words_gated():
    with pytest.raises(RuntimeError, match="poppler"):
        extract_pdf_words("/nonexistent.pdf")


def test_attach_pdf_coordinates_cogrouped(spark):
    from fonduer_spark.parse import CONTEXT_COLUMNS, CONTEXT_SCHEMA

    def sent(url, sid, pos, words):
        r = dict.fromkeys(CONTEXT_COLUMNS)
        r.update(url=url, stable_id=sid, ctx_type="sentence", position=pos,
                 words=words)
        return tuple(r[c] for c in CONTEXT_COLUMNS)

    sentences = spark.createDataFrame(
        [sent("d1", "d1::s0", 0, ["PN100A", "rated"]),
         sent("d1", "d1::s1", 1, ["85"]),
         sent("d2", "d2::s0", 0, ["solo"])],
        CONTEXT_SCHEMA)
    pdf_words = spark.createDataFrame(
        [("d1", 0, 1, 20, 32, 10, 80, "PN100A"),
         ("d1", 1, 1, 100, 112, 10, 60, "rated"),
         ("d1", 2, 1, 100, 112, 70, 110, "85."),
         ("d2", 0, 2, 5, 15, 5, 50, "solo")],
        "url string, seq long, page int, top int, bottom int, "
        "left int, right int, word string")
    out = {r.stable_id: r for r in
           attach_pdf_coordinates(sentences, pdf_words).collect()}
    assert out["d1::s0"].page == [1, 1]
    assert out["d1::s0"].left == [10, 10]
    assert out["d1::s1"].page == [1]
    assert out["d1::s1"].left == [70]          # linked to '85.' bbox
    assert out["d2::s0"].top == [5]            # per-doc isolation


def test_link_word_lists_property():
    """Property: for any token sequence and any light perturbation of it
    (suffix punctuation glued on, occasional typo), the 3-pass linker is
    total and links every unperturbed unique token exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tokens = st.lists(
        st.text(alphabet="abcdefg", min_size=1, max_size=6),
        min_size=1, max_size=40)

    @settings(max_examples=40, deadline=None)
    @given(tokens, st.randoms(use_true_random=False))
    def prop(toks, rnd):
        pdf = []
        for t in toks:
            r = rnd.random()
            if r < 0.15:
                pdf.append(t + ".")      # glued punctuation
            elif r < 0.25:
                pdf.append(("x" + t[1:]) if len(t) > 1 else t)  # typo
            else:
                pdf.append(t)
        links = link_word_lists(toks, pdf, search_max=10)
        assert len(links) == len(toks)
        assert all(0 <= k < len(pdf) for k in links)
        # unique & unperturbed tokens must link to themselves
        from collections import Counter
        ch, cp = Counter(toks), Counter(pdf)
        for i, t in enumerate(toks):
            if ch[t] == 1 and cp[t] == 1 and pdf[i] == t:
                assert pdf[links[i]] == t

    prop()
