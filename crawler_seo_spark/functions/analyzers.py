"""Per-page analysis kernels (metatags, headings, mixed content, links).

Pure functions over :class:`~crawler_seo_spark.functions.htmldoc.HtmlDoc`,
reproducing the reference analyzers' outputs:

* headings — ``analyzers/headings_analyzer.py:15-332``
* title/description/other metatags — ``analyzers/metatags_analyzer.py:81-194``
* mixed content — ``analyzers/status_analyzer.py:104-269``
* link extraction — ``core/crawler.py:185-199``

Everything *order-dependent across pages* (duplicate-title/description
flags, scores that depend on them, critical-issue/warning assembly) is NOT
computed here — it is computed Catalyst-side with window functions and
column arithmetic (see :mod:`crawler_seo_spark.plans.enrich`), because those
are relational, shuffle-bearing operations that belong in the JVM.

These kernels run inside Arrow-batched pandas UDFs: one Python call per
page, batched per Arrow chunk, never per-row serde.
"""

from __future__ import annotations

import re
from typing import Any
from urllib.parse import urljoin

from ..config import (
    GRAVITY_CRITICAL,
    GRAVITY_MEDIUM,
    HIDDEN_CSS_CLASSES,
    HIDDEN_STYLES,
    INVISIBLE_COLORS,
    MSG_FIRST_NOT_H1,
    MSG_H1_ABSENT,
    MSG_MULTIPLE_H1,
    MSG_NO_HEADINGS,
    PROBLEM_TYPE_EMPTY,
    PROBLEM_TYPE_HIDDEN,
    RGB_LIGHT_THRESHOLD,
    SUSPICIOUS_POSITIONING,
)
from .htmldoc import Element, HtmlDoc
from .urlnorm import canonicalize_url, is_relevant

_RGB_RE = re.compile(r"color:\s*rgb\(\s*(\d+)\s*,\s*(\d+)\s*,\s*(\d+)\s*\)")
_CSS_URL_RE = re.compile(r'url\(\s*["\']?(http://[^)"\']+)', re.IGNORECASE)


# ---------------------------------------------------------------------------
# Headings (C8-C15)
# ---------------------------------------------------------------------------

def _is_hidden(el: Element) -> bool:
    """Hidden-heading detection (reference: headings_analyzer.py:159-209)."""
    style = el.attr("style").lower()
    for s in HIDDEN_STYLES:
        if s in style:
            return True
    for c in INVISIBLE_COLORS:
        if c in style:
            return True
    for r, g, b in _RGB_RE.findall(style):
        if int(r) > RGB_LIGHT_THRESHOLD and int(g) > RGB_LIGHT_THRESHOLD \
                and int(b) > RGB_LIGHT_THRESHOLD:
            return True
    classes = el.attr("class").lower()
    for c in HIDDEN_CSS_CLASSES:
        if c in classes:
            return True
    for p in SUSPICIOUS_POSITIONING:
        if p in style:
            return True
    return False


def _problem_description(tag: str, posicao: int, texto: str,
                         motivos: list[str]) -> str:
    """Consolidated problem string (reference: headings_analyzer.py:259-273)."""
    desc = f"{tag.upper()} na posição {posicao}"
    if motivos:
        desc += f" ({', '.join(motivos).lower()})"
    if texto:
        desc += f': "{texto[:30]}..."' if len(texto) > 30 else f': "{texto}"'
    return desc


def analyze_headings(doc: HtmlDoc) -> dict[str, Any]:
    """Full heading analysis (reference: headings_analyzer.py:15-126,287-332).

    Quirks intentionally preserved:

    * sequence entries are always ``"tag:text[:30]..."`` — the ellipsis is
      unconditional (``:67``);
    * hierarchy-jump detection runs over ALL headings (including hidden and
      empty ones) but ONLY when an H1 exists (``:102``) — a page with no H1
      keeps ``hierarquia_correta == True`` no matter how broken the sequence;
    * the no-headings early return logs one problem but does not add the
      "H1 ausente" entry (``:34-38``).
    """
    out: dict[str, Any] = {
        "hierarquia_correta": True,
        "problemas_hierarquia": [],
        "headings_problematicos": [],
        "h1_count": 0,
        "h1_multiple": False,
        "h1_ausente": True,
        "heading_issues": [],
        "heading_sequence": [],
        "heading_sequence_valida": [],
        "total_problemas_headings": 0,
        "h1_text": "",
    }
    headings = doc.headings
    if not headings:
        out["problemas_hierarquia"].append(MSG_NO_HEADINGS)
        out["heading_issues"].append("Sem headings")
        out["total_problemas_headings"] = 1
        out.update(_heading_metrics(out))
        return out

    details: list[dict[str, Any]] = []
    levels: list[int] = []
    first_h1_text: str | None = None
    for i, h in enumerate(headings):
        nivel = int(h.tag[1])
        texto = h.text.strip()
        eh_vazio = len(texto) == 0
        eh_oculto = _is_hidden(h)
        motivos: list[str] = []
        if eh_vazio:
            motivos.append(PROBLEM_TYPE_EMPTY)
        if eh_oculto:
            motivos.append(PROBLEM_TYPE_HIDDEN)
        eh_problematico = eh_vazio or eh_oculto
        detail = {
            "posicao": i + 1, "tag": h.tag, "nivel": nivel, "texto": texto,
            "eh_problematico": eh_problematico, "eh_vazio": eh_vazio,
            "eh_oculto": eh_oculto, "motivos": motivos,
        }
        details.append(detail)
        levels.append(nivel)
        out["heading_sequence"].append(f"{h.tag}:{texto[:30]}...")
        if not eh_problematico:
            out["heading_sequence_valida"].append(f"{h.tag}:{texto[:30]}...")
        if h.tag == "h1":
            out["h1_count"] += 1
            out["h1_ausente"] = False
            if first_h1_text is None:
                first_h1_text = texto
        if eh_problematico:
            out["headings_problematicos"].append({
                "descricao": _problem_description(h.tag, i + 1, texto, motivos),
                "tag": h.tag,
                "posicao": i + 1,
                "texto": texto[:50] + "..." if len(texto) > 50 else texto,
                "motivos": motivos,
                "gravidade": GRAVITY_CRITICAL if h.tag == "h1" else GRAVITY_MEDIUM,
            })
            out["heading_issues"].append(out["headings_problematicos"][-1]["descricao"])
            out["total_problemas_headings"] += 1

    if out["h1_ausente"]:
        out["problemas_hierarquia"].append(MSG_H1_ABSENT)
        out["heading_issues"].append("H1 ausente")
        out["total_problemas_headings"] += 1
    if out["h1_count"] > 1:
        out["h1_multiple"] = True
        msg = MSG_MULTIPLE_H1.format(count=out["h1_count"])
        out["problemas_hierarquia"].append(msg)
        out["heading_issues"].append("Múltiplos H1")
        out["total_problemas_headings"] += 1

    if levels and not out["h1_ausente"]:
        seq_problems: list[str] = []
        if levels[0] != 1:
            seq_problems.append(MSG_FIRST_NOT_H1.format(tag=details[0]["tag"].upper()))
        for i in range(1, len(levels)):
            prev, curr = levels[i - 1], levels[i]
            if curr > prev + 1:
                skipped = ", ".join(f"H{n}" for n in range(prev + 1, curr))
                seq_problems.append(
                    f"Salto na hierarquia: {details[i-1]['tag'].upper()} → "
                    f"{details[i]['tag'].upper()} (níveis pulados: {skipped})")
        if seq_problems:
            out["hierarquia_correta"] = False
            out["problemas_hierarquia"].extend(seq_problems)
            out["heading_issues"].extend(seq_problems)
            out["total_problemas_headings"] += len(seq_problems)

    out["h1_text"] = first_h1_text or ""
    out.update(_heading_metrics(out))
    return out


def _heading_metrics(info: dict[str, Any]) -> dict[str, Any]:
    """Counts derived from the problematic list
    (reference: headings_analyzer.py:287-313)."""
    probs = info["headings_problematicos"]
    return {
        "headings_problematicos_count": len(probs),
        "headings_vazios_count": sum(1 for p in probs if PROBLEM_TYPE_EMPTY in p["motivos"]),
        "headings_ocultos_count": sum(1 for p in probs if PROBLEM_TYPE_HIDDEN in p["motivos"]),
        "headings_gravidade_critica": sum(1 for p in probs if p["gravidade"] == GRAVITY_CRITICAL),
    }


# ---------------------------------------------------------------------------
# Metatags (C5-C7) — everything except the cross-page duplicate flags
# ---------------------------------------------------------------------------

def analyze_metatags(doc: HtmlDoc) -> dict[str, Any]:
    """Title / description / other metatags
    (reference: metatags_analyzer.py:81-194 minus duplicate tracking)."""
    title = doc.title.strip()
    desc_tag = doc.find_meta(name="description")
    desc = desc_tag.attr("content").strip() if desc_tag else ""

    def pick(name: str) -> str:
        tag = doc.find_meta(name=name)
        return tag.attr("content").strip() if tag else ""

    def pick_og(prop: str) -> str:
        tag = doc.find_meta(property=prop)
        return tag.attr("content").strip() if tag else ""

    canonical = doc.find_link("canonical")
    og_title = pick_og("og:title")
    og_desc = pick_og("og:description")
    return {
        "title": title,
        "title_length": len(title),
        "meta_description": desc,
        "description_length": len(desc),
        "meta_keywords": pick("keywords"),
        "meta_robots": pick("robots"),
        "meta_viewport": pick("viewport"),
        "canonical_url": canonical.attr("href").strip() if canonical else "",
        "og_title": og_title,
        "og_description": og_desc,
        "og_image": pick_og("og:image"),
        "has_open_graph": bool(og_title or og_desc),
    }


# ---------------------------------------------------------------------------
# Mixed content (C20)
# ---------------------------------------------------------------------------

def _is_insecure(value: str) -> bool:
    """reference: status_analyzer.py:104-109"""
    return isinstance(value, str) and value.strip().lower().startswith("http://")


def _truncate_element(raw: str) -> str:
    return raw[:100] + "..." if len(raw) > 100 else raw


def analyze_mixed_content(doc: HtmlDoc, url: str) -> dict[str, Any]:
    """Eight-class insecure-resource scan on HTTPS pages
    (reference: status_analyzer.py:111-269). Scan-class order preserved:
    img, script, link, iframe, media(src,poster), <style> url(), style-attr
    url(), form — it determines the resource list order.

    The ``element`` field carries the raw OUTER source (start tag through
    matching end tag) for container tags — the reference stringifies the
    whole bs4 element; we report the original source bytes rather than a
    bs4 re-serialization (same content, original formatting). Void tags
    (img, link, source) report the start tag, which IS their whole element.
    """
    out = {
        "mixed_content_resources": [],
        "has_mixed_content": False,
        "mixed_content_count": 0,
        "critical_mixed_count": 0,
        "passive_mixed_count": 0,
    }
    if not url.startswith("https://"):
        return out
    resources: list[dict[str, str]] = []
    critical = passive = 0

    def add(kind: str, tag: str, attribute: str, target: str, raw: str,
            category: str) -> None:
        nonlocal critical, passive
        resources.append({
            "type": kind, "tag": tag, "attribute": attribute,
            "url": urljoin(url, target), "element": _truncate_element(raw),
            "category": category,
        })
        if category == "critical":
            critical += 1
        else:
            passive += 1

    for img in doc.imgs:
        src = img.attr("src").strip()
        if src and _is_insecure(src):
            add("image", "img", "src", src, img.raw, "passive")
    for script in doc.scripts:
        src = script.attr("src").strip()
        if _is_insecure(src):
            add("script", "script", "src", src,
                script.outer or script.raw, "critical")
    for link in doc.links:
        href = link.attr("href").strip()
        if href and _is_insecure(href):
            add("stylesheet", "link", "href", href, link.raw, "critical")
    for iframe in doc.iframes:
        src = iframe.attr("src").strip()
        if src and _is_insecure(src):
            add("iframe", "iframe", "src", src,
                iframe.outer or iframe.raw, "critical")
    for tag in doc.media:
        for attr in ("src", "poster"):
            if attr in tag.attrs:
                v = tag.attr(attr).strip()
                if _is_insecure(v):
                    add("media", tag.tag, attr, v,
                        tag.outer or tag.raw, "passive")
    for style in doc.style_blocks:
        for match in _CSS_URL_RE.findall(style.text or ""):
            add("inline-style", "style", "content", match,
                style.outer or style.raw, "passive")
    for el in doc.styled:
        for match in _CSS_URL_RE.findall(el.attr("style")):
            add("inline-style", el.tag, "style", match,
                el.outer or el.raw, "passive")
    for form in doc.forms:
        action = form.attr("action").strip()
        if action and _is_insecure(action):
            add("form", "form", "action", action,
                form.outer or form.raw, "critical")

    out.update({
        "mixed_content_resources": resources,
        "has_mixed_content": bool(resources),
        "mixed_content_count": len(resources),
        "critical_mixed_count": critical,
        "passive_mixed_count": passive,
    })
    return out


# ---------------------------------------------------------------------------
# Link extraction (C4) — document-order, canonicalized, relevance-filtered
# ---------------------------------------------------------------------------

def extract_links(doc: HtmlDoc, base_url: str,
                  base_domain: str | None) -> list[str]:
    """All ``<a href>`` targets, canonicalized against the page URL and
    relevance-filtered at extraction time (reference: core/crawler.py:185-199).
    Duplicates are kept (dedup happens at the frontier)."""
    links: list[str] = []
    for a in doc.anchors:
        href = a.attr("href").strip()
        if not href:
            continue
        norm = canonicalize_url(href, base_url, base_domain)
        if norm and is_relevant(norm):
            links.append(norm)
    return links


def extract_filtered(doc: HtmlDoc, base_url: str,
                     base_domain: str | None) -> list[tuple[str, str]]:
    """(url, reason) pairs for links dropped by the relevance filter at
    extraction — feeds the ``filtered`` log (reference logs one entry per
    occurrence, core/url_manager.py:287-299)."""
    from .urlnorm import canonicalize_url_ex, filter_reason
    out: list[tuple[str, str]] = []
    for a in doc.anchors:
        href = a.attr("href").strip()
        if not href:
            continue
        norm, invalid = canonicalize_url_ex(href, base_url, base_domain)
        if invalid:
            # reference logs normalization failures (url_manager.py:64-66)
            out.append((href, "INVALID_URL"))
        elif norm:
            reason = filter_reason(norm)
            if reason:
                out.append((norm, reason))
    return out
