from action_pdf_accessibility_paddle_docker_ray.functions.html_strip import strip_html


def test_nav_header_footer_aside_removed():
    html = (
        "<html><body><nav><p>menu items here</p></nav>"
        "<header><p>site header text</p></header>"
        "<p>This is the actual main content paragraph of the page.</p>"
        "<aside><p>related links sidebar</p></aside>"
        "<footer><p>copyright footer</p></footer></body></html>"
    )
    out = strip_html(html)
    assert out["text"] == "This is the actual main content paragraph of the page."
    boiler = {s["text"]: s["boiler"] for s in out["spans"]}
    assert boiler["menu items here"] is True
    assert boiler["copyright footer"] is True


def test_script_style_dropped_entirely():
    html = "<body><script>var x=1;</script><style>p{}</style><p>keep this content line</p></body>"
    out = strip_html(html)
    assert out["text"] == "keep this content line"
    assert all("var x" not in s["text"] for s in out["spans"])


def test_link_density_boilerplate():
    html = (
        "<body><p><a href='/a'>one</a> <a href='/b'>two</a> <a href='/c'>three</a></p>"
        "<p>A long enough paragraph of genuine readable content with one "
        "<a href='/d'>link</a> inside it that should survive.</p></body>"
    )
    out = strip_html(html)
    spans = out["spans"]
    assert spans[0]["boiler"] is True  # nearly all linked text
    assert spans[1]["boiler"] is False


def test_article_blocks_always_content():
    html = "<body><article><p></p><p>x</p></article></body>"
    out = strip_html(html)
    # empty and short blocks survive inside <article> (main-container rule)
    assert out["text"] == "\nx"


def test_entity_roundtrip():
    html = "<body><article><p>a &amp; b &lt; c</p></article></body>"
    assert strip_html(html)["text"] == "a & b < c"


def test_heading_labels():
    html = "<body><article><h1>Doc Title</h1><h2>Section</h2><p>body text</p></article></body>"
    out = strip_html(html)
    labels = [s["label"] for s in out["spans"]]
    assert labels == ["doc_title", "paragraph_title", "text"]
    assert out["text"] == "Doc Title\nSection\nbody text"


def test_table_extraction():
    html = "<body><article><table><tr><td>a1</td><td>b1</td></tr><tr><td>a2</td><td>b2</td></tr></table></article></body>"
    out = strip_html(html)
    table_spans = [s for s in out["spans"] if s["label"] == "table"]
    assert len(table_spans) == 1
    assert table_spans[0]["text"] == "a1\tb1\t\na2\tb2\t"


def test_empty_body():
    out = strip_html("<html><body></body></html>")
    assert out["text"] == "" and out["spans"] == []
