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
