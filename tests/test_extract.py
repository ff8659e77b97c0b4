from etl_ray.extract import extract_text
from etl_ray.gen import make_html


def test_basic_extraction():
    html = b"<html><head><script>x=1</script><style>p{}</style></head><body><h1>Hi</h1><p>a &amp; b</p><!-- c --></body></html>"
    assert extract_text(html) == "Hi\na & b"


def test_deterministic_and_stable():
    h = make_html("https://d0.example.com/p/1", 2)
    t1, t2 = extract_text(h), extract_text(bytes(h))
    assert t1 == t2
    assert "script" not in t1 and "<" not in t1


def test_none_and_str_inputs():
    assert extract_text(None) == ""
    assert extract_text("<p>x</p>") == "x"


def test_entities_and_bad_utf8():
    assert extract_text(b"<p>&#169; caf\xc3\xa9</p>") == "© café"
    out = extract_text(b"<p>bad \xff byte</p>")
    assert "bad" in out and "byte" in out


def test_whitespace_normalization_golden():
    """Byte-exact whitespace semantics, pinned: ASCII ws runs collapse to
    one space, spaces absorb into newlines, blank lines collapse — while
    Unicode whitespace (U+00A0 from &nbsp;) is PRESERVED except where the
    blank-line rule (\\n\\s*\\n) swallows it.  These cases were verified
    byte-identical across the round-3 pattern rewrite (500k fixture docs
    differentially compared); any future refactor must keep them."""
    cases = {
        b"a  b": "a b",
        b"a\tb": "a b",
        b"a \n \n b": "a\nb",
        b"a\r\nb": "a\nb",
        b"a\v\fb": "a b",
        b" \n \n ": "",
        b"a&nbsp;\nb": "a\xa0\nb",
        b"x&nbsp;&nbsp;y": "x\xa0\xa0y",
        b"a&#160;\n&#160;\nb": "a\xa0\nb",  # nbsp BETWEEN newlines: blank-line rule eats it
    }
    for html, want in cases.items():
        assert extract_text(html) == want, html
