"""Deterministic synthetic site graph (seed 42, no network, no external data).

One synthetic domain (``https://shop.example.test``) whose pages embed:

* ``<a href>`` links written in every raw shape the canonicalizer must
  handle — relative paths, fragments, duplicate slashes, trailing slashes,
  tracking params (reference branches: core/url_manager.py:36-137),
* decoy links the relevance filters must drop (e-commerce endpoints, blocked
  extensions, technical paths — core/url_manager.py:146-196) and off-domain
  links (dropped silently at normalize),
* priority-pattern paths (``/product/``, ``/category/``, … —
  core/crawler.py:275-278),
* titles/descriptions with controlled length buckets and deliberate
  cross-page duplicates (exercises the order-dependent duplicate flags,
  metatags_analyzer.py:196-228),
* heading structures incl. empty/hidden/multiple-h1/hierarchy-jump cases,
* mixed-content resources (http:// on https pages),
* ``<img>`` tags whose ``data-image-id`` and ``alt`` carry the image_id and
  caption of rows in the image+caption table (the BASELINE input_hint
  payload), so caption extraction can be validated row-for-row.

The page store is the *fetch oracle*: fetching a URL is a lookup (or a
broadcast/shuffle join, on the Spark side). The graph is connected: page i
always links to 2i+1 and 2i+2 (binary-tree edges ⇒ every page reachable
from the root), plus seeded extra edges for realistic fan-out and dedup
pressure.
"""

from __future__ import annotations

import random

from .images import make_caption

DOMAIN = "shop.example.test"
BASE = f"https://{DOMAIN}"
SEED_URL = f"{BASE}/"

_TITLE_POOL = [
    # (title, bucket) — lengths straddle the 30/60 thresholds
    "Loja",                                                       # Muito curto
    "Promoções da Semana em Eletrônicos e Casa",                  # OK (43)
    "Guia Completo de Compras Online com Dicas de Especialistas "
    "para Todas as Categorias",                                   # Muito longo
    "",                                                           # Ausente
    "Ofertas Imperdíveis de Tecnologia 2024",                     # OK (39)
]

_DESC_POOL = [
    "Descrição curta.",  # Muito curto
    "Encontre as melhores ofertas em eletrônicos, moda e casa com frete "
    "rápido para todo o país e atendimento especializado em cada etapa.",  # OK (134)
    "",  # Ausente
    "Uma descrição extremamente detalhada e prolixa que ultrapassa o limite "
    "máximo recomendado de cento e sessenta caracteres para meta descriptions "
    "em mecanismos de busca modernos, o que gera truncamento.",  # Muito longo
]


def page_paths(n: int) -> list[str]:
    """Deterministic URL paths — mixes priority and normal patterns."""
    paths = []
    for i in range(n):
        k = i % 10
        if i == 0:
            paths.append("/")
        elif k in (1, 2):
            paths.append(f"/product/item-{i}")
        elif k == 3:
            paths.append(f"/category/cat-{i}")
        elif k == 4:
            paths.append(f"/service/svc-{i}")
        elif k == 5:
            paths.append(f"/about/team-{i}")
        elif k in (6, 7):
            paths.append(f"/blog/post-{i}")
        else:
            paths.append(f"/page/info-{i}")
    return paths


def _raw_href(target_path: str, rng: random.Random) -> str:
    """Write a link in one of the raw shapes the canonicalizer normalizes."""
    styles = rng.randrange(8)
    if styles == 0:
        return target_path  # relative-absolute path
    if styles == 1:
        return f"{BASE}{target_path}"
    if styles == 2:
        return f"{BASE}{target_path}?utm_source=news&utm_medium=mail"
    if styles == 3:
        return f"{target_path}#section-{rng.randrange(5)}"
    if styles == 4 and target_path != "/":
        return f"{target_path}/"  # trailing slash variant
    if styles == 5:
        return target_path.replace("/", "//", 1)  # duplicate slash
    if styles == 6:
        return f"{target_path}?b=2&a=1&a=0"  # param-order variant
    return f"https://www.{DOMAIN}{target_path}"  # www variant


_DECOYS = [
    "/checkout/cart/add/99",          # ECOMMERCE_ENDPOINT
    "/admin/login",                   # ECOMMERCE_ENDPOINT
    "/theme/style.css",               # FILE_EXTENSION
    "/docs/manual.pdf",               # FILE_EXTENSION
    "/wp-content/uploads/banner",     # TECHNICAL_PATTERN
    "/api/v2/items",                  # TECHNICAL_PATTERN
    "https://other-domain.example/x", # off-domain (silent drop)
    "mailto:sales@example.test",      # non-http scheme (silent drop)
]


def _headings_html(i: int, rng: random.Random) -> str:
    """Heading block exercising the reference's problem taxonomy."""
    variant = i % 8
    if variant == 0:
        return "<h1>Título Principal</h1><h2>Seção</h2><h3>Detalhe</h3>"
    if variant == 1:  # hierarchy jump h2→h6 under an existing h1
        return "<h1>Título</h1><h2>Nível 2</h2><h6>Salto</h6>"
    if variant == 2:  # empty h2 + hidden h2
        return ('<h1>Título</h1><h2></h2>'
                '<h2 style="display:none">Invisível</h2><h3>Ok</h3>')
    if variant == 3:  # multiple h1
        return "<h1>Primeiro</h1><h1>Segundo</h1><h2>Seção</h2>"
    if variant == 4:  # no h1 (hierarchy problems suppressed per reference)
        return "<h2>Sem H1</h2><h4>Salto ignorado</h4>"
    if variant == 5:  # hidden via class + invisible color
        return ('<h1>Título</h1><h2 class="sr-only">Leitor</h2>'
                '<h3 style="color: rgb(251, 252, 253)">Quase branco</h3>')
    if variant == 6:  # no headings at all
        return "<p>Página sem headings.</p>"
    return "<h1>Título Base</h1><h2>Α</h2><h3>Β</h3><h4>Γ</h4>"


def _mixed_content_html(i: int) -> str:
    if i % 6 == 2:
        return ('<img src="http://cdn-insecure.example/banner.gif" alt="ad">'
                '<script src="http://cdn-insecure.example/t.js"></script>')
    if i % 6 == 4:
        return ('<link rel="stylesheet" href="http://cdn-insecure.example/s.css">'
                '<div style="background: url(http://cdn-insecure.example/bg.png)">x</div>')
    return ""


def build_site(n_pages: int, n_images: int = 0, seed: int = 42,
               extra_links: int = 3) -> dict[str, dict]:
    """Build the page store: canonical URL → page record.

    Records carry everything the synthetic fetch returns: status_code,
    content_type, final_url, response_time_ms, content_length, headers,
    html, image_ids.
    """
    paths = page_paths(n_pages)
    urls = [BASE + (p if p == "/" else p) for p in paths]
    store: dict[str, dict] = {}
    for i, (path, url) in enumerate(zip(paths, urls)):
        rng = random.Random(seed * 7_919 + i)

        # --- link targets: tree edges + seeded extras + a self/dup echo ----
        targets = [t for t in (2 * i + 1, 2 * i + 2) if t < n_pages]
        for _ in range(extra_links):
            targets.append(rng.randrange(n_pages))
        hrefs = [_raw_href(paths[t], rng) for t in targets]
        if i % 4 == 1:  # duplicate link on the page (frontier dedup pressure)
            hrefs.append(paths[targets[0]])
        for d in range(i % 3):  # decoys (filtered log pressure)
            hrefs.append(_DECOYS[(i + d) % len(_DECOYS)])
        anchors = "\n".join(f'<a href="{h}">link {j}</a>' for j, h in enumerate(hrefs))

        # --- metatags ------------------------------------------------------
        title = _TITLE_POOL[i % len(_TITLE_POOL)]
        desc = _DESC_POOL[i % len(_DESC_POOL)]
        og = ('<meta property="og:title" content="OG título">'
              '<meta property="og:description" content="OG descrição">'
              ) if i % 3 == 0 else ""
        viewport = ('<meta name="viewport" content="width=device-width">'
                    ) if i % 2 == 0 else ""
        canonical = f'<link rel="canonical" href="{url}">' if i % 5 == 0 else ""

        # --- images (payload table hookup) ----------------------------------
        image_ids: list[str] = []
        img_html = ""
        if n_images:
            for j in range((i % 3) + 1):
                idx = (i * 13 + j * 7) % n_images
                iid = f"img-{idx:010d}"
                image_ids.append(iid)
                img_html += (
                    f'<img src="/media/{iid}.png" data-image-id="{iid}" '
                    f'alt="{make_caption(idx)}">\n')

        html = f"""<html><head>
<title>{title}</title>
<meta name="description" content="{desc}">
{viewport}{og}{canonical}
</head><body>
{_headings_html(i, rng)}
{_mixed_content_html(i)}
{img_html}
{anchors}
</body></html>"""

        # --- response shape --------------------------------------------------
        status = 200
        content_type = "text/html; charset=utf-8"
        final_url = url
        if i % 23 == 7:
            final_url = urls[(i + 1) % n_pages]  # followed redirect, 200 at end
        elif i % 29 == 11:
            status = 404
        elif i % 31 == 13:
            status = 500
        elif i % 37 == 17:
            status = 403
        elif i % 43 == 19:
            status = 301  # unfollowed redirect surfaced as-is
            final_url = urls[(i + 2) % n_pages]
        if i % 41 == 21:
            content_type = "application/json"

        headers = {"content-type": content_type}
        if i % 2 == 0:
            headers["X-Frame-Options"] = "DENY"
        if i % 3 == 0:
            headers["Strict-Transport-Security"] = "max-age=63072000"
        if i % 5 == 0:
            headers["Content-Security-Policy"] = "default-src 'self'"
        if i % 7 == 0:
            headers["X-Content-Type-Options"] = "nosniff"
        if i % 11 == 0:
            headers["Referrer-Policy"] = "no-referrer"
        if i % 13 == 0:
            headers["X-XSS-Protection"] = "1; mode=block"
        content_length = 2048 + (i * 997) % 4096
        if i % 53 == 23:
            content_length = 2_000_000  # perf-flag page (> 1 MiB)
        headers["Content-Length"] = str(content_length)

        store[url] = {
            "url": url,
            "page_index": i,
            "status_code": status,
            "content_type": content_type.split(";")[0],
            "final_url": final_url,
            "response_time_ms": 40.0 + (i * 31) % 400,
            "content_length": content_length,
            "html": html,
            "headers": headers,
            "image_ids": image_ids,
        }
    return store
