"""Derive a crawlable synthetic site from the driver's ``documents`` table.

Makes the flagship ``entry()`` crawl consume the provided testdata parquet
(TESTDATA.md requirement) instead of free-standing synthetic pages: each
document row becomes one page of a single synthetic domain — its text
supplies title/description/body, its ``doc_id`` supplies the deterministic
link graph (binary-tree edges 2i+1/2i+2 ⇒ connected from the root, plus
modular extras for dedup pressure), and the usual decoy links exercise the
relevance filters.

Deterministic, no RNG: every page is a pure function of its document row.
"""

from __future__ import annotations

from ..sources.synthetic_site import BASE, DOMAIN

SEED_URL = f"{BASE}/"


def doc_path(doc_id: int) -> str:
    k = doc_id % 10
    if doc_id == 0:
        return "/"
    if k in (1, 2):
        return f"/product/item-{doc_id}"
    if k == 3:
        return f"/category/cat-{doc_id}"
    if k == 4:
        return f"/service/svc-{doc_id}"
    if k in (5, 6):
        return f"/blog/post-{doc_id}"
    return f"/page/info-{doc_id}"


def doc_url(doc_id: int) -> str:
    p = doc_path(doc_id)
    return BASE + p


_DECOYS = ["/checkout/cart/add/1", "/theme/app.css", "/api/items",
           "https://elsewhere.example/x"]


def page_from_document(doc_id: int, text: str, n_docs: int) -> dict:
    """One page record (same schema as synthetic_site.build_site rows)."""
    words = text.split()
    title = " ".join(words[:6])[:55]
    if doc_id % 7 == 3:
        title = "Título compartilhado entre páginas"  # deliberate duplicates
    desc = " ".join(words[:30])[:150]
    headings = f"<h1>{' '.join(words[:4])}</h1><h2>{' '.join(words[4:8])}</h2>"
    if doc_id % 9 == 2:
        headings += "<h5>salto</h5>"
    if doc_id % 9 == 5:
        headings = f"<h2>{' '.join(words[:3])}</h2>"  # no h1

    targets = [t for t in (2 * doc_id + 1, 2 * doc_id + 2) if t < n_docs]
    targets.append((doc_id * 37 + 11) % n_docs)
    hrefs = []
    for j, t in enumerate(targets):
        p = doc_path(t)
        if (doc_id + j) % 4 == 1:
            hrefs.append(f"{p}?utm_source=feed")
        elif (doc_id + j) % 4 == 2 and p != "/":
            hrefs.append(p + "/")
        else:
            hrefs.append(p)
    hrefs.append(_DECOYS[doc_id % len(_DECOYS)])
    anchors = "".join(f'<a href="{h}">l{j}</a>' for j, h in enumerate(hrefs))

    url = doc_url(doc_id)
    status = 200
    if doc_id % 29 == 11:
        status = 404
    elif doc_id % 31 == 13:
        status = 500
    body = " ".join(words[:300])
    html = (f"<html><head><title>{title}</title>"
            f'<meta name="description" content="{desc}">'
            f"</head><body>{headings}<p>{body}</p><p>{body}</p>"
            f"<p>{body}</p><p>{body}</p>"
            f"{anchors}</body></html>")
    return {
        "url": url,
        "page_index": doc_id,
        "status_code": status,
        "content_type": "text/html",
        "final_url": url,
        "response_time_ms": float(40 + doc_id % 200),
        "content_length": len(html),
        "html": html,
        "headers": {"content-type": "text/html; charset=utf-8"},
        "image_ids": [],
    }


def pages_df_from_documents(spark, sf_dir: str, limit: int | None = None):
    """documents.parquet → page-store DataFrame (distributed derivation via
    mapInPandas — the per-page build never leaves the executors)."""
    import pandas as pd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    if limit:
        docs = docs.filter(f"doc_id < {limit}")
        n_docs = min(n_docs, limit)

    def build(batches):
        for pdf in batches:
            rows = [page_from_document(int(d), t or "", n_docs)
                    for d, t in zip(pdf["doc_id"], pdf["text"])]
            yield pd.DataFrame(rows)

    schema = ("url string, page_index long, status_code int, "
              "content_type string, final_url string, response_time_ms double, "
              "content_length long, html string, headers map<string,string>, "
              "image_ids array<string>")
    return docs.select("doc_id", "text").mapInPandas(build, schema=schema)


def store_from_documents(rows: list[tuple[int, str]], n_docs: int) -> dict:
    """Oracle-side page store from collected (doc_id, text) rows."""
    return {page_from_document(d, t or "", n_docs)["url"]:
            page_from_document(d, t or "", n_docs)
            for d, t in rows}
