"""DOM layer semantics (lxml-parity where the parse operator depends on it)."""

from fonduer_spark.htmldom import getpath, parse_html, strip_tags, tostring


def test_text_tail_structure():
    root = parse_html("<html><body><p>a<b>b</b>c</p>tail</body></html>")
    body = root.find("body")
    p = body.find("p")
    assert p.text == "a"
    b = p.find("b")
    assert b.text == "b" and b.tail == "c"
    assert p.tail == "tail"


def test_comment_dropped_merges_text():
    root = parse_html("<html><body><p>a<!-- x -->b</p></body></html>")
    p = root.find("body").find("p")
    assert p.text == "ab"


def test_strip_tags_span_br():
    # <span> text merges in place; children splice; tail merges
    root = parse_html(
        "<html><body><p>a<span>b<i>c</i>d</span>e</p></body></html>"
    )
    strip_tags(root, ["span"])
    p = root.find("body").find("p")
    assert p.text == "ab"
    i = p.find("i")
    assert i.text == "c" and i.tail == "de"


def test_strip_tags_nested_flatten():
    root = parse_html("<html><body><p><span><span>x</span>y</span>z</p></body></html>")
    strip_tags(root, ["span"])
    p = root.find("body").find("p")
    assert p.text == "xyz" and len(p) == 0


def test_strip_br_merges_adjacent_text():
    root = parse_html("<html><body><p>a<br>b</p></body></html>")
    strip_tags(root, ["br"])
    p = root.find("body").find("p")
    assert p.text == "ab"


def test_tostring_roundtrip_deterministic():
    html = '<html><body><p class="x">a &amp; b</p></body></html>'
    r1, r2 = parse_html(html), parse_html(html)
    assert tostring(r1) == tostring(r2)
    assert 'class="x"' in tostring(r1)
    assert "a &amp; b" in tostring(r1)


def test_getpath_positional_predicates():
    root = parse_html(
        "<html><body><p>1</p><div>d</div><p>2</p></body></html>"
    )
    body = root.find("body")
    ps = [c for c in body if c.tag == "p"]
    assert getpath(ps[0]) == "/html/body/p[1]"
    assert getpath(ps[1]) == "/html/body/p[2]"
    assert getpath(body.find("div")) == "/html/body/div"


def test_void_elements_and_implicit_close():
    root = parse_html("<html><body><img src='x.png'>t<td>oops</body></html>")
    body = root.find("body")
    img = body.find("img")
    assert img is not None and img.get("src") == "x.png"
    assert img.tail == "t"


def test_fragment_wrap():
    root = parse_html("<p>a</p><p>b</p>")
    assert root.tag == "div" and len(root) == 2


def _tree_equal(a, b):
    return (
        a.tag == b.tag and a.attrib == b.attrib and a.text == b.text
        and a.tail == b.tail and len(a) == len(b)
        and all(_tree_equal(x, y) for x, y in zip(a, b))
    )


def test_fast_scanner_equivalence_corpus():
    """The fast tokenizer must produce the exact same DOM as the stdlib
    html.parser path on every synthetic corpus page (the documents that the
    whole oracle chain depends on)."""
    from fonduer_spark.corpus import render_page
    from fonduer_spark.htmldom import parse_html, parse_html_stdlib, tostring

    for i in range(200):
        html = render_page(i, "alpha beta gamma delta epsilon")
        fast, std = parse_html(html), parse_html_stdlib(html)
        assert _tree_equal(fast, std), f"doc {i}"
        assert tostring(fast) == tostring(std), f"doc {i}"


def test_fast_scanner_equivalence_nasty():
    """Unit equivalence on markup corners: entities (text + attrs), quotes,
    valueless and unquoted attrs, self-closing, comments containing '>',
    doctype/PI, rawtext script/style with tags inside, unquoted value with
    trailing slash, tag soup (unclosed/mismatched), case folding."""
    from fonduer_spark.htmldom import parse_html, parse_html_stdlib, tostring

    cases = [
        '<html><body><p>&amp; &lt;x&gt; &#65;&#x42;</p></body></html>',
        '<div title="a &amp; b" alt=\'c &lt; d\'>t</div>',
        '<td colspan rowspan="2" align=left>x</td>',
        '<div><br/><img src="i.png"/><hr></div>',
        '<!DOCTYPE html><html><!-- a > b --><body>x</body></html>',
        '<?xml version="1.0"?><div>pi</div>',
        '<html><script>if (a<b && c>d) { x="</div>"; }</script><p>t</p></html>',
        '<style>.c { content: "<p>"; }</style>',
        '<a href=foo/>tail</a>',
        '<ul><li>one<li>two<li>three</ul>',
        '<table><tr><td>a<td>b<tr><td>c</table>',
        '<DIV CLASS="Up">X</DIV>',
        '<p>unclosed <b>bold <i>both</p><p>next</p>',
        '<div>text</span></div>',
        '<div  a = "1"   b  =  2  >x</div>',
        '<div>no tags at all',
        'plain text only',
        '<x:ns attr:q="1">ns</x:ns>',
    ]
    for h in cases:
        fast, std = parse_html(h), parse_html_stdlib(h)
        assert _tree_equal(fast, std), h
        assert tostring(fast) == tostring(std), h


def test_fast_scanner_fallback_paths():
    """Out-of-grammar inputs must transparently use the stdlib parser."""
    from fonduer_spark.htmldom import parse_html, parse_html_stdlib, tostring

    cases = [
        '<div>a < b</div>',          # stray '<' as text
        '<div><!-- unterminated',    # unterminated comment
        '<script>never closed',      # rawtext without close
        '<div',                      # unterminated tag
    ]
    for h in cases:
        assert tostring(parse_html(h)) == tostring(parse_html_stdlib(h)), h


def test_fast_scanner_equivalence_property():
    """Property-based equivalence: structured random HTML (nested tags,
    attrs in all quote styles, entities, comments, void/self-closing
    elements, tag soup) must produce identical DOMs from the fast scanner
    and the stdlib parser."""
    from hypothesis import given, settings, strategies as st

    from fonduer_spark.htmldom import parse_html, parse_html_stdlib, tostring

    tags = st.sampled_from(["div", "p", "b", "table", "tr", "td", "ul",
                            "li", "span", "h1"])
    words = st.text(
        alphabet="abcXYZ019 .,&;", min_size=0, max_size=12).map(
        lambda s: s.replace("&", "&amp;"))
    attr = st.sampled_from(
        ['', ' class="x y"', " id='k'", ' data-v=plain', ' checked',
         ' title="a &lt; b"'])

    @st.composite
    def node(draw, depth=0):
        t = draw(tags)
        a = draw(attr)
        if depth >= 2 or draw(st.booleans()):
            return f"<{t}{a}>{draw(words)}</{t}>"
        kids = "".join(draw(node(depth + 1)) for _ in range(draw(
            st.integers(0, 3))))
        closer = "" if draw(st.booleans()) else f"</{t}>"  # tag soup
        return f"<{t}{a}>{draw(words)}{kids}{draw(words)}{closer}"

    extras = st.sampled_from(
        ["", "<!-- c > d -->", "<br/>", "<img src=i.png>", "<!DOCTYPE html>"])

    @settings(max_examples=200, deadline=None)
    @given(st.lists(node(), min_size=1, max_size=4), extras)
    def check(nodes, extra):
        html = "<html><body>" + extra + "".join(nodes) + "</body></html>"
        assert tostring(parse_html(html)) == tostring(parse_html_stdlib(html))

    check()
