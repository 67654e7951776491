from tesseract_wasm_ray.functions.boilerplate import strip_boilerplate


def test_plain_text_passthrough():
    assert strip_boilerplate("  hello   world ") == "hello world"
    assert strip_boilerplate("a &amp; b") == "a & b"


def test_nav_footer_dropped():
    html = (
        "<html><body>"
        "<nav><a href='#'>Home</a> <a href='#'>About</a></nav>"
        "<p>THE MAIN CONTENT SENTENCE LIVES HERE TODAY.</p>"
        "<footer>copyright 2026 nobody</footer>"
        "</body></html>"
    )
    assert strip_boilerplate(html) == "THE MAIN CONTENT SENTENCE LIVES HERE TODAY."


def test_link_farm_dropped_content_kept():
    html = (
        "<div><a href='1'>aaa</a> <a href='2'>bbb</a> <a href='3'>ccc</a></div>"
        "<div>THIS LONG ENOUGH BLOCK HAS NO LINKS AT ALL IN IT.</div>"
    )
    assert strip_boilerplate(html) == "THIS LONG ENOUGH BLOCK HAS NO LINKS AT ALL IN IT."


def test_class_hints():
    html = (
        "<div class='sidebar'>PRETTY LONG NAVIGATION TEXT THAT WOULD OTHERWISE PASS.</div>"
        "<div class='content'>SHORT</div>"
    )
    assert strip_boilerplate(html) == "SHORT"


def test_multiple_paragraphs_joined_with_newline():
    html = "<p>FIRST PARAGRAPH OF CONTENT.</p><p>SECOND PARAGRAPH OF CONTENT.</p>"
    assert strip_boilerplate(html) == (
        "FIRST PARAGRAPH OF CONTENT.\nSECOND PARAGRAPH OF CONTENT."
    )


def test_script_style_comment_removed():
    html = (
        "<script>var x = 'THE FAKE CONTENT';</script>"
        "<style>p { color: red }</style>"
        "<!-- A COMMENT WITH WORDS -->"
        "<p>REAL CONTENT PARAGRAPH WITH ENOUGH LENGTH.</p>"
    )
    assert strip_boilerplate(html) == "REAL CONTENT PARAGRAPH WITH ENOUGH LENGTH."


def test_nested_drop_subtree():
    html = (
        "<aside><div><p>HIDDEN DEEP BOILERPLATE TEXT BLOCK.</p></div></aside>"
        "<p>VISIBLE CONTENT PARAGRAPH REMAINS HERE.</p>"
    )
    assert strip_boilerplate(html) == "VISIBLE CONTENT PARAGRAPH REMAINS HERE."


def test_entities_and_whitespace():
    html = "<p>A &amp; B &lt;= C,\n   D &nbsp; E.</p>"
    assert strip_boilerplate(html) == "A & B <= C, D E."
