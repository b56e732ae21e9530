"""Deterministic offline stand-ins for the reference's live-network example.

``examples/quotes_to_scrape.py:16-30`` trains on the Einstein author page of
quotes.toscrape.com and extracts from the Rowling page; tests must not touch
the network, so these synthetic pages reproduce the relevant structure
(``.author-title`` / ``.author-born-date`` markup) byte-deterministically.
"""
from __future__ import annotations

QUOTES_AUTHORS = {
    "einstein": {
        "name": "Albert Einstein",
        "born": "March 14, 1879",
        "location": "in Ulm, Germany",
    },
    "rowling": {
        "name": "J.K. Rowling",
        "born": "July 31, 1965",
        "location": "in Yate, South Gloucestershire, England, the United Kingdom",
    },
    "austen": {
        "name": "Jane Austen",
        "born": "December 16, 1775",
        "location": "in Steventon Rectory, Hampshire, The United Kingdom",
    },
}


def quotes_author_page(author_key: str) -> bytes:
    a = QUOTES_AUTHORS[author_key]
    html = f"""<html>
<head><title>Quotes to Scrape</title></head>
<body>
    <div class="container">
        <div class="author-details">
            <h3 class="author-title">{a["name"]}</h3>
            <p>Born: <span class="author-born-date">{a["born"]}</span>
            <span class="author-born-location">{a["location"]}</span></p>
            <div class="author-description">Some description text about {a["name"]}.</div>
        </div>
        <footer class="footer">Quotes by GoodReads; made with love.</footer>
    </div>
</body>
</html>"""
    return html.encode()
