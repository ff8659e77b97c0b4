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
