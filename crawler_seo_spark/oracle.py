"""Pure-Python oracle: reference crawl semantics over the synthetic store.

Re-implements the reference's frontier + analysis behavior in plain Python
(deques + sets + dicts) to produce golden outputs the Spark engine must
match EXACTLY:

* ``crawl_order`` — dequeue order (BFS FIFO; priority queue drained first in
  smart mode) with batch boundaries (reference: core/crawler.py:61-106,
  core/url_manager.py:200-260, 346-404),
* ``seen`` — the registered URL set (+ md5 hashes),
* ``filtered`` — the per-occurrence filtered-URL log,
* ``results`` — the wide analysis rows incl. the order-dependent duplicate
  flags and scores (reference: analyzers/*, main.py:89-162).

Determinism note: the reference gathers batch results with
``as_completed`` (core/crawler.py:117), so *its* link-enqueue order is
thread-timing-dependent. The canonical deterministic order — identical to
the reference at ``max_threads=1`` and to any run where futures complete in
submission order — processes batch results in batch (dequeue) order. Both
the oracle and the Spark engine implement that canonical order.

This module is for correctness testing only; it is intentionally
single-machine and O(pages) in memory.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Any

from .config import (
    DESCRIPTION_MAX_LENGTH,
    DESCRIPTION_MIN_LENGTH,
    PENALTY_DUPLICATE_DESCRIPTION,
    PENALTY_DUPLICATE_TITLE,
    SCORE_DESCRIPTION_OK,
    SCORE_TITLE_OK,
    STATUS_ABSENT,
    STATUS_OK,
    STATUS_TOO_LONG,
    STATUS_TOO_SHORT,
    TITLE_MAX_LENGTH,
    TITLE_MIN_LENGTH,
    CrawlConfig,
)
from .functions.analyzers import (
    analyze_headings,
    analyze_metatags,
    analyze_mixed_content,
    extract_filtered,
    extract_links,
)
from .functions.htmldoc import parse_html
from .functions.urlnorm import (
    base_domain_of,
    canonicalize_url,
    filter_detail,
    filter_reason,
    is_priority,
    url_md5,
)

SECURITY_HEADER_FLAGS = {
    "hsts_present": "Strict-Transport-Security",
    "csp_present": "Content-Security-Policy",
    "x_frame_options": "X-Frame-Options",
    "x_content_type_options": "X-Content-Type-Options",
    "referrer_policy": "Referrer-Policy",
}


def c21_status_fields(rec: dict) -> dict:
    """C21 auxiliary outputs (status_analyzer.py:271-324): present-header
    map (X-XSS-Protection included), >1 MB performance issue, 301/302 +
    non-HTML SEO status issues — reference strings verbatim. Header names
    match case-insensitively (requests' dict is case-insensitive; live
    servers send lowercase), output keys keep the canonical spellings."""
    from .config import SECURITY_HEADERS
    headers = {k.lower(): v for k, v in rec.get("headers", {}).items()}
    perf = []
    cl = headers.get("content-length")
    if cl and int(cl) > 1024 * 1024:
        perf.append(f"Página muito grande ({cl} bytes)")
    seo = []
    if rec["status_code"] in (301, 302):
        seo.append("Redirect pode afetar SEO")
    if "text/html" not in (rec.get("content_type") or "").lower():
        seo.append("Content-Type não é HTML")
    return {
        "Security_Headers": {k: headers[k.lower()] for k in SECURITY_HEADERS
                             if headers.get(k.lower())},
        "Performance_Issues": " | ".join(perf),
        "SEO_Status_Issues": " | ".join(seo),
    }


def length_status(n: int, lo: int, hi: int) -> str:
    if n == 0:
        return STATUS_ABSENT
    if n < lo:
        return STATUS_TOO_SHORT
    if n > hi:
        return STATUS_TOO_LONG
    return STATUS_OK


@dataclass
class OracleRun:
    crawl_order: list[dict] = field(default_factory=list)   # seq,url,depth,priority
    seen_urls: set[str] = field(default_factory=set)
    seen_hashes: set[str] = field(default_factory=set)
    filtered: list[dict] = field(default_factory=list)      # url,reason,details
    results: list[dict] = field(default_factory=list)       # wide rows
    rounds: list[dict] = field(default_factory=list)        # per-round metrics
    stats: dict = field(default_factory=dict)


class _Frontier:
    """Two-deque priority frontier with triple-redundant dedup
    (reference: core/url_manager.py)."""

    def __init__(self, base_domain: str, smart: bool,
                 priority_patterns: list[str]) -> None:
        self.base_domain = base_domain
        self.smart = smart
        self.priority_patterns = priority_patterns
        self.priority_q: deque[tuple[str, int]] = deque()
        self.normal_q: deque[tuple[str, int]] = deque()
        self.registered: set[str] = set()
        self.hashes: set[str] = set()
        self.processed: set[str] = set()
        self.duplicates = 0
        self.found = 0
        self.filtered_log: list[dict] = []

    def add(self, url: str, depth: int, base_url: str | None = None,
            priority: bool = False) -> bool:
        norm = canonicalize_url(url, base_url, self.base_domain)
        if not norm:
            return False
        if norm in self.registered or norm in self.processed \
                or url_md5(norm) in self.hashes:
            self.duplicates += 1
            return False
        reason = filter_reason(norm)
        if reason:
            self.filtered_log.append({
                "url": norm, "reason": reason, "details": filter_detail(norm)})
            return False
        if self.smart and not priority:
            priority = is_priority(norm, self.priority_patterns)
        self.registered.add(norm)
        self.hashes.add(url_md5(norm))
        (self.priority_q if (self.smart and priority) else self.normal_q
         ).append((norm, depth))
        self.found += 1
        return True

    def pop(self) -> tuple[str | None, int | None, bool]:
        if self.priority_q:
            url, depth = self.priority_q.popleft()
            if url not in self.processed:
                self.processed.add(url)
                return url, depth, True
        if self.normal_q:
            url, depth = self.normal_q.popleft()
            if url not in self.processed:
                self.processed.add(url)
                return url, depth, False
        return None, None, False

    def __len__(self) -> int:
        return len(self.priority_q) + len(self.normal_q)


class _DupTracker:
    """Order-dependent duplicate flags (reference:
    metatags_analyzer.py:196-228): first occurrence is NOT flagged, every
    later one IS; empty values exempt."""

    def __init__(self) -> None:
        self.counts: dict[str, int] = {}

    def track(self, value: str) -> bool:
        if not value:
            return False
        self.counts[value] = self.counts.get(value, 0) + 1
        return self.counts[value] > 1


def _status_warnings(status: int, url: str, final_url: str) -> list[str]:
    """reference: status_analyzer.py:84-97"""
    if status == 200:
        return []
    warnings = [f"Página retornou código de status {status}"]
    if status in (301, 302, 303, 307, 308):
        warnings.append(f"Redirect {status}: {url} → {final_url}")
    elif status == 404:
        warnings.append("Página não encontrada (404)")
    elif status >= 500:
        warnings.append(f"Erro do servidor ({status})")
    elif status == 403:
        warnings.append("Acesso negado (403)")
    return warnings


def analyze_page_oracle(rec: dict, url: str, titles: _DupTracker,
                        descs: _DupTracker) -> dict[str, Any]:
    """Integrated analysis of one 200-HTML page, reference arithmetic
    (metatags_analyzer.py:230-327, headings score
    headings_analyzer.py:341-367, status_analyzer.py:271-353,
    main.py:89-162)."""
    doc = parse_html(rec["html"])
    h = analyze_headings(doc)
    m = analyze_metatags(doc)
    mc = analyze_mixed_content(doc, url)

    title_status = length_status(m["title_length"], TITLE_MIN_LENGTH, TITLE_MAX_LENGTH)
    desc_status = length_status(
        m["description_length"], DESCRIPTION_MIN_LENGTH, DESCRIPTION_MAX_LENGTH)
    title_dup = titles.track(m["title"])
    desc_dup = descs.track(m["meta_description"])

    # headings score (clamped 0..35)
    hs = 0
    if not h["h1_ausente"] and not h["h1_multiple"]:
        hs += 20
    elif not h["h1_ausente"]:
        hs += 10
    if h["hierarquia_correta"]:
        hs += 15
    criticos = h["headings_gravidade_critica"]
    outros = h["headings_problematicos_count"] - criticos
    hs -= criticos * 10 + outros * 3
    if not h["hierarquia_correta"]:
        hs -= 15
    hs = max(0, min(hs, 35))

    score = 0
    if title_status == STATUS_OK and not title_dup:
        score += SCORE_TITLE_OK
    elif title_dup:
        score += max(0, SCORE_TITLE_OK - PENALTY_DUPLICATE_TITLE)
    if desc_status == STATUS_OK and not desc_dup:
        score += SCORE_DESCRIPTION_OK
    elif desc_dup:
        score += max(0, SCORE_DESCRIPTION_OK - PENALTY_DUPLICATE_DESCRIPTION)
    score += hs
    bonus = (5 if m["has_open_graph"] else 0) + (3 if m["meta_viewport"] else 0) \
        + (2 if m["canonical_url"] else 0)
    score = min(score + bonus, 100)

    critical: list[str] = []
    if title_status == STATUS_ABSENT:
        critical.append("Title ausente")
    if desc_status == STATUS_ABSENT:
        critical.append("Meta description ausente")
    if h["h1_ausente"]:
        critical.append("H1 ausente")
    if criticos > 0:
        critical.append(f"H1s problemáticos ({criticos})")

    warns: list[str] = []
    if title_dup:
        warns.append("Title duplicado")
    if desc_dup:
        warns.append("Description duplicada")
    if h["h1_multiple"]:
        warns.append("Múltiplos H1")
    if not h["hierarquia_correta"]:
        warns.append("Hierarquia de headings incorreta")
    if h["headings_problematicos_count"] > 0:
        warns.append(f"Headings problemáticos ({h['headings_problematicos_count']})")
    if title_status in (STATUS_TOO_SHORT, STATUS_TOO_LONG):
        warns.append(f"Title {title_status.lower()}")
    if desc_status in (STATUS_TOO_SHORT, STATUS_TOO_LONG):
        warns.append(f"Description {desc_status.lower()}")

    status_warns = _status_warnings(rec["status_code"], url, rec["final_url"])
    headers = {k.lower(): v for k, v in rec.get("headers", {}).items()}
    flags = {k: bool(headers.get(v.lower()))
             for k, v in SECURITY_HEADER_FLAGS.items()}
    missing = sum(1 for v in flags.values() if not v)
    risk_score = min((mc["critical_mixed_count"] * 2 + mc["passive_mixed_count"]
                      + missing * 3) * 10, 100)
    risk_level = "high" if risk_score >= 70 else "medium" if risk_score >= 40 else "low"

    all_warnings = status_warns + warns + [f"CRÍTICO: {c}" for c in critical]

    return {
        "Title": m["title"], "Title_Length": m["title_length"],
        "Title_Status": title_status,
        "Title_Duplicado": "SIM" if title_dup else "NÃO",
        "Meta_Description": m["meta_description"],
        "Description_Length": m["description_length"],
        "Description_Status": desc_status,
        "Description_Duplicada": "SIM" if desc_dup else "NÃO",
        "H1_Count": h["h1_count"], "H1_Text": h["h1_text"],
        "H1_Ausente": "SIM" if h["h1_ausente"] else "NÃO",
        "H1_Multiple": "SIM" if h["h1_multiple"] else "NÃO",
        "Hierarquia_Correta": "SIM" if h["hierarquia_correta"] else "NÃO",
        "Headings_Problematicos_Total": h["headings_problematicos_count"],
        "Headings_Vazios": h["headings_vazios_count"],
        "Headings_Ocultos": h["headings_ocultos_count"],
        "Headings_Criticos": criticos,
        "Heading_Sequence_Completa": " → ".join(h["heading_sequence"]),
        "Heading_Sequence_Valida": " → ".join(h["heading_sequence_valida"]),
        "Total_Problemas_Headings": h["total_problemas_headings"],
        "Metatags_Score": score,
        "Headings_Score": hs,
        "Critical_Issues": " | ".join(critical),
        "Warnings": " | ".join(all_warnings),
        "Has_Mixed_Content": "SIM" if mc["has_mixed_content"] else "NÃO",
        "Mixed_Content_Count": mc["mixed_content_count"],
        "Critical_Mixed_Count": mc["critical_mixed_count"],
        "Passive_Mixed_Count": mc["passive_mixed_count"],
        "Canonical_URL": m["canonical_url"], "Meta_Viewport": m["meta_viewport"],
        "Has_Open_Graph": "SIM" if m["has_open_graph"] else "NÃO",
        "Risk_Level": risk_level, "Risk_Score": risk_score,
        "hsts_present": flags["hsts_present"],
        "csp_present": flags["csp_present"],
        "x_frame_options": flags["x_frame_options"],
        "x_content_type_options": flags["x_content_type_options"],
        "referrer_policy": flags["referrer_policy"],
        **c21_status_fields(rec),
    }


def run_oracle(store: dict[str, dict], config: CrawlConfig) -> OracleRun:
    """Run the full reference-semantics crawl over the synthetic store."""
    out = OracleRun()
    base_domain = base_domain_of(config.seed_url)
    frontier = _Frontier(base_domain, config.smart, config.priority_patterns)
    titles, descs = _DupTracker(), _DupTracker()

    if config.seed_urls:
        # multi-seed variant: pattern-classified priority, list order
        for raw in config.seed_urls:
            frontier.add(raw, 0)
    else:
        frontier.add(config.seed_url, 0, priority=config.smart)

    seq = 0
    round_id = 0
    while len(frontier) and len(out.results) < config.max_urls:
        batch: list[tuple[str, int, bool]] = []
        while (len(batch) < config.batch_size and len(frontier)
               and len(out.results) + len(batch) < config.max_urls):
            url, depth, prio = frontier.pop()
            if url is not None:
                batch.append((url, depth, prio))
        if not batch:
            break
        batch_results = []
        for url, depth, prio in batch:
            out.crawl_order.append({
                "crawl_seq": seq, "url": url, "depth": depth,
                "priority": prio, "round": round_id})
            seq += 1
            rec = store.get(url)
            if rec is None:
                rec = {"url": url, "status_code": 404, "content_type": "",
                       "final_url": url, "response_time_ms": 0.0,
                       "content_length": 0, "html": "", "headers": {},
                       "image_ids": []}
            row: dict[str, Any] = {
                "URL": url, "depth": depth,
                "Status_Code": rec["status_code"],
                "Response_Time_ms": rec["response_time_ms"],
                "Content_Type": rec["content_type"],
                "Final_URL": rec["final_url"],
                "Redirected": rec["final_url"] != url,
                "links_encontrados": [],
            }
            if rec["status_code"] == 200 and "text/html" in rec["content_type"].lower():
                doc = parse_html(rec["html"])
                row.update(analyze_page_oracle(rec, url, titles, descs))
                if depth < config.max_depth:
                    row["links_encontrados"] = extract_links(doc, url, base_domain)
                    for furl, reason in extract_filtered(doc, url, base_domain):
                        frontier.filtered_log.append({
                            "url": furl, "reason": reason,
                            "details": filter_detail(furl)})
            else:
                row["Warnings"] = " | ".join(_status_warnings(
                    rec["status_code"], url, rec["final_url"]))
                row.update(c21_status_fields(rec))
            batch_results.append(row)
        out.results.extend(batch_results)
        enq = 0
        for row in batch_results:
            for link in row["links_encontrados"]:
                if link not in frontier.processed:
                    if frontier.add(link, row["depth"] + 1, base_url=row["URL"]):
                        enq += 1
        out.rounds.append({
            "round": round_id, "dequeued": len(batch), "enqueued": enq,
            "frontier_after": len(frontier)})
        round_id += 1

    out.seen_urls = set(frontier.registered)
    out.seen_hashes = set(frontier.hashes)
    out.filtered = frontier.filtered_log
    out.stats = {
        "urls_found": frontier.found,
        "urls_processed": len(out.crawl_order),
        "urls_duplicates": frontier.duplicates,
        "urls_filtered": len(frontier.filtered_log),
        "rounds": round_id,
    }
    return out
