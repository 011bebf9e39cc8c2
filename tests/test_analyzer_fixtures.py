"""Analyzer parity on the reference's own inline test fixtures.

The HTML documents below reproduce the reference's inline tests
(metatags_analyzer.py:504-522, headings_analyzer.py:442-453 & 505-513,
status_analyzer.py:397-425); expected values are hand-derived from the
reference's code paths (bs4 is not installed here, so the reference itself
cannot run — these constants ARE its documented behavior).

Pure-Python (no Spark session needed): the kernels under test are the same
ones the Arrow UDFs execute.
"""

from crawler_seo_spark.functions.analyzers import (
    analyze_headings,
    analyze_metatags,
    analyze_mixed_content,
)
from crawler_seo_spark.functions.htmldoc import parse_html
from crawler_seo_spark.oracle import _status_warnings, length_status

METATAGS_FIXTURE = """
<html>
<head>
    <title>Página de Teste SEO</title>
    <meta name="description" content="Esta é uma descrição de teste para análise SEO com tamanho adequado para validação completa.">
    <meta name="viewport" content="width=device-width, initial-scale=1">
    <meta property="og:title" content="Título Open Graph">
    <link rel="canonical" href="https://test.com/canonical">
</head>
<body>
    <h1>Título Principal</h1>
    <h2></h2><!-- Heading vazio -->
    <h3>Subtítulo</h3>
    <h6>Salto na hierarquia</h6>
    <h2 style="color: white;">Heading Oculto</h2><!-- Heading oculto -->
    <h1>Segundo H1</h1><!-- H1 duplicado -->
</body>
</html>
"""


def test_metatags_fixture():
    doc = parse_html(METATAGS_FIXTURE)
    m = analyze_metatags(doc)
    assert m["title"] == "Página de Teste SEO"
    assert m["title_length"] == len("Página de Teste SEO")
    assert length_status(m["title_length"], 30, 60) == "Muito curto"
    assert length_status(m["description_length"], 120, 160) == "Muito curto"
    assert m["meta_viewport"] == "width=device-width, initial-scale=1"
    assert m["og_title"] == "Título Open Graph"
    assert m["has_open_graph"] is True
    assert m["canonical_url"] == "https://test.com/canonical"


def test_headings_fixture_integrated():
    h = analyze_headings(parse_html(METATAGS_FIXTURE))
    assert h["h1_count"] == 2
    assert h["h1_multiple"] is True
    assert h["h1_ausente"] is False
    assert h["h1_text"] == "Título Principal"
    assert h["headings_problematicos_count"] == 2
    assert h["headings_vazios_count"] == 1
    assert h["headings_ocultos_count"] == 1
    assert h["headings_gravidade_critica"] == 0  # both problems are h2s
    assert h["hierarquia_correta"] is False
    assert "Múltiplos H1 (2)" in h["problemas_hierarquia"]
    assert ("Salto na hierarquia: H3 → H6 (níveis pulados: H4, H5)"
            in h["problemas_hierarquia"])
    # 2 problematic + multiple-h1 + 1 jump = 4 (reference counting)
    assert h["total_problemas_headings"] == 4
    # sequences carry the unconditional '...' suffix (reference quirk, :67)
    assert h["heading_sequence"][0] == "h1:Título Principal..."
    assert h["heading_sequence"][1] == "h2:..."
    assert len(h["heading_sequence"]) == 6
    assert len(h["heading_sequence_valida"]) == 4  # two problematic dropped
    # problem descriptions (headings_analyzer.py:259-273)
    descs = [p["descricao"] for p in h["headings_problematicos"]]
    assert descs[0] == "H2 na posição 2 (vazio)"
    assert descs[1] == 'H2 na posição 5 (oculto): "Heading Oculto"'


def test_hierarchy_fix_fixture():
    """headings_analyzer.py:442-453 — jump detection must use ALL headings
    (hidden/empty included)."""
    html = """
    <html><head><title>Teste Hierarquia</title></head><body>
        <h1>Título Principal</h1>
        <h2>Subtítulo Nível 2</h2>
        <h3 style="display: none;">Nível 3 OCULTO</h3>
        <h4></h4>
        <h6>SALTO PARA H6</h6>
        <h3>Volta para H3</h3>
    </body></html>"""
    h = analyze_headings(parse_html(html))
    assert h["hierarquia_correta"] is False
    assert ("Salto na hierarquia: H4 → H6 (níveis pulados: H5)"
            in h["problemas_hierarquia"])
    assert h["headings_ocultos_count"] == 1
    assert h["headings_vazios_count"] == 1


def test_simple_jump_fixture():
    """headings_analyzer.py:505-513 — H2 → H6."""
    html = "<html><body><h1>Título</h1><h2>Nível 2</h2><h6>SALTO</h6></body></html>"
    h = analyze_headings(parse_html(html))
    assert any("H2" in p and "H6" in p for p in h["problemas_hierarquia"])
    assert ("Salto na hierarquia: H2 → H6 (níveis pulados: H3, H4, H5)"
            in h["problemas_hierarquia"])
    assert h["hierarquia_correta"] is False


def test_no_h1_suppresses_hierarchy_problems():
    """Reference quirk (headings_analyzer.py:102): without an H1, sequence
    jumps are never evaluated — hierarquia_correta stays True."""
    html = "<html><body><h2>Sem H1</h2><h6>Salto enorme</h6></body></html>"
    h = analyze_headings(parse_html(html))
    assert h["hierarquia_correta"] is True
    assert h["h1_ausente"] is True
    assert "H1 ausente" in h["problemas_hierarquia"]


def test_no_headings_fixture():
    h = analyze_headings(parse_html("<html><body><p>x</p></body></html>"))
    assert h["problemas_hierarquia"] == ["Nenhum heading encontrado"]
    assert h["heading_issues"] == ["Sem headings"]
    assert h["total_problemas_headings"] == 1
    assert h["hierarquia_correta"] is True  # early return (:34-38)


MIXED_FIXTURE = """
<html>
<head>
    <title>Teste Mixed Content</title>
    <link rel="stylesheet" href="http://insecure.com/style.css">
    <script src="http://insecure.com/script.js"></script>
</head>
<body>
    <img src="http://insecure.com/image.jpg" alt="Imagem insegura">
    <iframe src="http://insecure.com/iframe.html"></iframe>
    <img src="https://secure.com/safe.jpg" alt="Imagem segura">
</body>
</html>
"""


def test_mixed_content_fixture():
    mc = analyze_mixed_content(parse_html(MIXED_FIXTURE), "https://test.com")
    assert mc["has_mixed_content"] is True
    assert mc["mixed_content_count"] == 4
    assert mc["critical_mixed_count"] == 3  # script + stylesheet + iframe
    assert mc["passive_mixed_count"] == 1   # the http img
    kinds = [(r["type"], r["category"]) for r in mc["mixed_content_resources"]]
    # scan-class order: img, script, link, iframe (status_analyzer.py:134-191)
    assert kinds == [("image", "passive"), ("script", "critical"),
                     ("stylesheet", "critical"), ("iframe", "critical")]
    assert mc["mixed_content_resources"][0]["url"] \
        == "http://insecure.com/image.jpg"


def test_mixed_content_http_page_skipped():
    mc = analyze_mixed_content(parse_html(MIXED_FIXTURE), "http://test.com")
    assert mc["mixed_content_count"] == 0  # HTTPS-only gate (F8, :121-123)


def test_style_url_and_form_scan():
    html = """
    <html><body>
      <style>.bg { background: url(http://cdn.bad/x.png); }</style>
      <div style="background-image: url('http://cdn.bad/y.png')">x</div>
      <form action="http://insecure.com/submit"><input></form>
    </body></html>"""
    mc = analyze_mixed_content(parse_html(html), "https://test.com")
    kinds = [(r["type"], r["tag"], r["attribute"], r["category"])
             for r in mc["mixed_content_resources"]]
    assert kinds == [("inline-style", "style", "content", "passive"),
                     ("inline-style", "div", "style", "passive"),
                     ("form", "form", "action", "critical")]


def test_status_warning_strings():
    """status_analyzer.py:84-97 warning buckets."""
    assert _status_warnings(200, "u", "u") == []
    assert _status_warnings(301, "https://a/x", "https://a/y") == [
        "Página retornou código de status 301",
        "Redirect 301: https://a/x → https://a/y"]
    assert _status_warnings(404, "u", "u")[1] == "Página não encontrada (404)"
    assert _status_warnings(503, "u", "u")[1] == "Erro do servidor (503)"
    assert _status_warnings(403, "u", "u")[1] == "Acesso negado (403)"


def test_hidden_heading_detectors():
    """All five hidden-detection classes (headings_analyzer.py:159-209)."""
    cases = {
        '<h2 style="display:none">x</h2>': True,
        '<h2 style="visibility: hidden">x</h2>': True,
        '<h2 style="color: #fff">x</h2>': True,
        '<h2 style="color: rgb(251, 252, 253)">x</h2>': True,  # all > 250
        '<h2 style="color: rgb(250, 252, 253)">x</h2>': False,  # 250 not >
        '<h2 class="sr-only">x</h2>': True,
        '<h2 class="visually-hidden extra">x</h2>': True,
        '<h2 style="text-indent:-9999px">x</h2>': True,
        '<h2 style="position:absolute">x</h2>': True,
        "<h2>visible</h2>": False,
    }
    for frag, hidden in cases.items():
        h = analyze_headings(parse_html(f"<html><body><h1>t</h1>{frag}</body></html>"))
        assert (h["headings_ocultos_count"] == 1) is hidden, frag


def test_mixed_content_element_is_outer_html():
    """Container elements report their whole outer source (reference
    stringifies the full bs4 element, status_analyzer.py:134-147); void
    tags report the start tag; >100 chars truncates with '...'."""
    html = ('<html><body>'
            '<iframe src="http://x.test/f.html">inner text</iframe>'
            '<script src="http://x.test/s.js"></script>'
            '<img src="http://x.test/i.png">'
            '<form action="http://x.test/go"><input name="q"></form>'
            f'<iframe src="http://x.test/long.html">{"y" * 200}</iframe>'
            '</body></html>')
    mc = analyze_mixed_content(parse_html(html), "https://test.com/")
    el = {(r["tag"], r["url"]): r["element"]
          for r in mc["mixed_content_resources"]}
    assert el[("iframe", "http://x.test/f.html")] \
        == '<iframe src="http://x.test/f.html">inner text</iframe>'
    assert el[("script", "http://x.test/s.js")] \
        == '<script src="http://x.test/s.js"></script>'
    assert el[("img", "http://x.test/i.png")] \
        == '<img src="http://x.test/i.png">'
    assert el[("form", "http://x.test/go")] \
        == '<form action="http://x.test/go"><input name="q"></form>'
    long_el = el[("iframe", "http://x.test/long.html")]
    assert long_el.endswith("...") and len(long_el) == 103
