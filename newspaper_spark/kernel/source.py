"""Source (crawler) layer kernels: category-URL and feed discovery.

Re-expression of Source.build's extraction steps
(/root/reference/newspaper/source.py:87-335, extractors.py:377-393,
591-753) minus network I/O: given a page's HTML, derive category urls,
feed urls, and article (url, title) pairs. The Spark layer composes
these per-row kernels into the explode/filter/dedup lineage.
"""
from __future__ import annotations

import re
from urllib.parse import urlparse

from ..dom import Element, find_by_tag, fromstring
from .scorer import get_text
from .urlutils import extract_domain, get_domain, get_path, get_scheme, prepare_url

_CATEGORY_STOPWORDS = [
    "about", "help", "privacy", "legal", "feedback", "sitemap", "profile",
    "account", "mobile", "sitemap", "facebook", "myspace", "twitter",
    "linkedin", "bebo", "friendster", "stumbleupon", "youtube", "vimeo",
    "store", "mail", "preferences", "maps", "password", "imgur", "flickr",
    "search", "subscription", "itunes", "siteindex", "events", "stop",
    "jobs", "careers", "newsletter", "subscribe", "academy", "shopping",
    "purchase", "site-map", "shop", "donate", "newsletter", "product",
    "advert", "info", "tickets", "coupons", "forum", "board", "archive",
    "browse", "howto", "how to", "faq", "terms", "charts", "services",
    "contact", "plus", "admin", "login", "signup", "register", "developer",
    "proxy",
]

_URL_RE = re.compile(
    r"http[s]?://(?:[a-zA-Z]|[0-9]|[$-_@.&+]|[!*\(\),]|(?:%[0-9a-fA-F][0-9a-fA-F]))+"
)


def get_urls(doc_or_html, titles: bool = False):
    """All <a href> urls of a page (extractors.py:591-627)."""
    if doc_or_html is None:
        return []
    doc = fromstring(doc_or_html) if isinstance(doc_or_html, str) else doc_or_html
    if doc is None:
        return []
    a_tags = find_by_tag(doc, tag="a")
    if titles:
        return [(a.get("href"), a.text) for a in a_tags if a.get("href")]
    return [a.get("href") for a in a_tags if a.get("href")]


def get_urls_regex(html: str):
    """Raw-regex URL scrape used for RSS feeds (extractors.py:615-621)."""
    stripped = re.sub("<[^<]+?>", " ", str(html))
    return [u.strip() for u in _URL_RE.findall(stripped)]


def get_category_urls(source_url: str, doc_or_html) -> list:
    """Top-level section urls of a source page (extractors.py:629-753)."""
    page_urls = get_urls(doc_or_html)
    valid_categories = []
    for p_url in page_urls:
        scheme = get_scheme(p_url, allow_fragments=False)
        domain = get_domain(p_url, allow_fragments=False)
        path = get_path(p_url, allow_fragments=False)
        if not domain and not path:
            continue
        if path and path.startswith("#"):
            continue
        if scheme and (scheme != "http" and scheme != "https"):
            continue
        if domain:
            child_tld = extract_domain(p_url)
            domain_tld = extract_domain(source_url)
            child_subdomain_parts = child_tld.subdomain.split(".")
            subdomain_contains = any(
                part == domain_tld.domain for part in child_subdomain_parts
            )
            if not subdomain_contains and (child_tld.domain != domain_tld.domain):
                continue
            elif child_tld.subdomain in ["m", "i"]:
                continue
            else:
                valid_categories.append(scheme + "://" + domain)
        else:
            path_chunks = [x for x in path.split("/") if len(x) > 0]
            if "index.html" in path_chunks:
                path_chunks.remove("index.html")
            if len(path_chunks) == 1 and len(path_chunks[0]) < 14:
                valid_categories.append(domain + path)

    _valid_categories = []
    for p_url in valid_categories:
        path = get_path(p_url)
        subdomain = extract_domain(p_url).subdomain
        conjunction = path + " " + subdomain
        if not any(bad.lower() in conjunction.lower() for bad in _CATEGORY_STOPWORDS):
            _valid_categories.append(p_url)

    _valid_categories.append("/")  # the root is always a category
    for i, p_url in enumerate(_valid_categories):
        if p_url.startswith("://"):
            _valid_categories[i] = "http" + p_url
    for i, p_url in enumerate(_valid_categories):
        if _valid_categories[i].endswith("/"):
            _valid_categories[i] = _valid_categories[i][:-1]

    _valid_categories = list(set(_valid_categories))
    category_urls = [prepare_url(p, source_url) for p in _valid_categories]
    return sorted(c for c in category_urls if c)


def get_feed_urls(source_url: str, category_doc_or_html) -> list:
    """RSS <link type=application/rss+xml> hrefs, capped at 50
    (extractors.py:377-393)."""
    doc = (
        fromstring(category_doc_or_html)
        if isinstance(category_doc_or_html, str)
        else category_doc_or_html
    )
    if doc is None:
        return []
    feed_urls = []
    for node in find_by_tag(doc, attr="type", value="application/rss+xml"):
        href = node.get("href")
        if href:
            feed_urls.append(href)
    feed_urls = feed_urls[:50]
    urls = [prepare_url(f, source_url) for f in feed_urls]
    return sorted(set(u for u in urls if u))


def feed_to_article_urls(source_url: str, feed_html: str) -> list:
    """Regex URL scrape of an RSS payload, domain-filtered
    (source.py:255-282)."""
    urls = get_urls_regex(feed_html)
    source_domain = get_domain(source_url) or ""
    return [u for u in urls if source_domain in u]


def category_to_article_pairs(category_url: str, html: str) -> list:
    """(url, title) pairs from a category page (source.py:284-317)."""
    pairs = get_urls(html, titles=True)
    out = []
    for href, title in pairs:
        if not href:
            continue
        prepared = prepare_url(href, category_url)
        if prepared:
            out.append((prepared, title or ""))
    return out
