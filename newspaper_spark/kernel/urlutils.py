"""URL predicates & helpers (re-expression of
/root/reference/newspaper/urls.py).

``tldextract`` is unavailable on the executors, so registered-domain
splitting uses an embedded mini public-suffix list covering the common
two-label suffixes; semantics match tldextract for the URL corpus the
reference tests against (tests/data/test_urls.txt).
"""
from __future__ import annotations

import re
from urllib.parse import parse_qs, urljoin, urlparse

_STRICT_DATE_REGEX_PREFIX = r"(?<=\W)"
DATE_REGEX = (
    r"([\./\-_]{0,1}(19|20)\d{2})[\./\-_]{0,1}(([0-3]{0,1}[0-9][\./\-_])|"
    r"(\w{3,5}[\./\-_]))([0-3]{0,1}[0-9][\./\-]{0,1})?"
)
STRICT_DATE_REGEX = _STRICT_DATE_REGEX_PREFIX + DATE_REGEX

ALLOWED_TYPES = [
    "html", "htm", "md", "rst", "aspx", "jsp", "rhtml", "cgi",
    "xhtml", "jhtml", "asp", "shtml",
]
GOOD_PATHS = [
    "story", "article", "feature", "featured", "slides", "slideshow",
    "gallery", "news", "video", "media", "v", "radio", "press",
]
BAD_CHUNKS = [
    "careers", "contact", "about", "faq", "terms", "privacy", "advert",
    "preferences", "feedback", "info", "browse", "howto", "account",
    "subscribe", "donate", "shop", "admin",
]
BAD_DOMAINS = ["amazon", "doubleclick", "twitter"]

# mini public-suffix set: two-label suffixes that commonly occur in news
# URLs; anything else is treated as a one-label TLD.
_TWO_LABEL_SUFFIXES = frozenset(
    """co.uk org.uk ac.uk gov.uk me.uk net.uk ltd.uk plc.uk sch.uk
    com.au net.au org.au edu.au gov.au id.au asn.au
    co.nz net.nz org.nz govt.nz ac.nz geek.nz gen.nz maori.nz school.nz
    co.za org.za net.za gov.za ac.za web.za
    com.br net.br org.br gov.br edu.br
    co.in net.in org.in gen.in firm.in ind.in gov.in ac.in edu.in res.in
    co.jp ne.jp or.jp go.jp ac.jp ad.jp ed.jp gr.jp lg.jp
    com.cn net.cn org.cn gov.cn edu.cn ac.cn
    com.hk net.hk org.hk edu.hk gov.hk idv.hk
    com.tw net.tw org.tw edu.tw gov.tw idv.tw
    com.sg net.sg org.sg edu.sg gov.sg per.sg
    com.mx net.mx org.mx gob.mx edu.mx
    com.ar net.ar org.ar gob.ar edu.ar int.ar
    co.kr ne.kr or.kr go.kr re.kr pe.kr ac.kr
    com.tr net.tr org.tr gov.tr edu.tr
    co.il net.il org.il gov.il ac.il muni.il
    com.my net.my org.my gov.my edu.my
    co.id net.id or.id go.id ac.id web.id
    com.ph net.ph org.ph gov.ph edu.ph
    com.pk net.pk org.pk gov.pk edu.pk
    com.eg net.eg org.eg gov.eg edu.eg
    com.sa net.sa org.sa gov.sa edu.sa
    com.ng net.ng org.ng gov.ng edu.ng
    co.ke or.ke go.ke ac.ke ne.ke
    com.ua net.ua org.ua gov.ua edu.ua in.ua
    com.ru net.ru org.ru msk.ru spb.ru
    co.th in.th or.th go.th ac.th net.th
    com.vn net.vn org.vn gov.vn edu.vn
    com.co net.co org.co gov.co edu.co nom.co
    com.pe net.pe org.pe gob.pe edu.pe
    com.ve net.ve org.ve gob.ve co.ve
    com.uy net.uy org.uy gub.uy edu.uy
    co.cr ac.cr go.cr or.cr
    com.do net.do org.do gob.do edu.do
    com.gt net.gt org.gt gob.gt edu.gt
    com.pa net.pa org.pa gob.pa edu.pa
    com.py net.py org.py gov.py edu.py
    com.bo net.bo org.bo gob.bo edu.bo
    com.ec net.ec org.ec gob.ec edu.ec
    com.ni gob.ni org.ni edu.ni
    com.sv gob.sv org.sv edu.sv
    com.hn net.hn org.hn gob.hn edu.hn
    co.ao it.ao og.ao pb.ao ed.ao gv.ao
    co.zw org.zw gov.zw ac.zw
    co.zm org.zm gov.zm ac.zm
    co.tz or.tz go.tz ac.tz ne.tz
    co.ug or.ug go.ug ac.ug ne.ug sc.ug
    com.gh org.gh gov.gh edu.gh
    com.et gov.et org.et edu.et
    com.ly net.ly org.ly gov.ly edu.ly
    com.jo net.jo org.jo gov.jo edu.jo
    com.lb net.lb org.lb gov.lb edu.lb
    com.kw net.kw org.kw gov.kw edu.kw
    com.qa net.qa org.qa gov.qa edu.qa
    com.bh net.bh org.bh gov.bh edu.bh
    com.om net.om org.om gov.om edu.om
    co.ae net.ae org.ae gov.ae ac.ae
    com.np net.np org.np gov.np edu.np
    com.bd net.bd org.bd gov.bd edu.bd
    com.lk net.lk org.lk gov.lk edu.lk
    co.ma net.ma org.ma gov.ma ac.ma press.ma
    com.dz net.dz org.dz gov.dz edu.dz
    com.tn net.tn org.tn gov.tn
    gouv.fr com.fr asso.fr nom.fr prd.fr presse.fr tm.fr
    co.at or.at ac.at gv.at priv.at
    com.pl net.pl org.pl gov.pl edu.pl waw.pl
    com.pt net.pt org.pt gov.pt edu.pt publ.pt
    com.gr net.gr org.gr gov.gr edu.gr
    com.ro nt.ro org.ro tm.ro store.ro www.ro
    co.hu org.hu info.hu priv.hu tm.hu 2000.hu
    com.mt net.mt org.mt gov.mt edu.mt
    com.cy net.cy org.cy gov.cy ac.cy
    co.im com.im net.im org.im ac.im
    co.je co.gg
    """.split()
)


class DomainParts:
    __slots__ = ("subdomain", "domain", "suffix")

    def __init__(self, subdomain, domain, suffix):
        self.subdomain = subdomain
        self.domain = domain
        self.suffix = suffix


def extract_domain(url: str) -> DomainParts:
    """tldextract.extract equivalent for our mini suffix list."""
    netloc = urlparse(url).netloc if "//" in url else urlparse("http://" + url).netloc
    netloc = netloc.split("@")[-1].split(":")[0].strip(".").lower()
    if not netloc:
        return DomainParts("", "", "")
    labels = netloc.split(".")
    if len(labels) >= 3 and ".".join(labels[-2:]) in _TWO_LABEL_SUFFIXES:
        suffix_len = 2
    elif len(labels) >= 2:
        suffix_len = 1
    else:
        return DomainParts("", netloc, "")
    suffix = ".".join(labels[-suffix_len:])
    rest = labels[:-suffix_len]
    domain = rest[-1] if rest else ""
    subdomain = ".".join(rest[:-1])
    return DomainParts(subdomain, domain, suffix)


def redirect_back(url: str, source_domain: str) -> str:
    parse_data = urlparse(url)
    domain = parse_data.netloc
    query = parse_data.query
    if source_domain in domain or domain in source_domain:
        return url
    query_item = parse_qs(query)
    if query_item.get("url"):
        return query_item["url"][0]
    return url


def prepare_url(url: str, source_url: str | None = None) -> str:
    try:
        if source_url is not None:
            source_domain = urlparse(source_url).netloc
            proper_url = urljoin(source_url, url)
            proper_url = redirect_back(proper_url, source_domain)
        else:
            proper_url = url
    except ValueError:
        proper_url = ""
    return proper_url


def url_to_filetype(abs_url: str) -> str | None:
    path = urlparse(abs_url).path
    if path.endswith("/"):
        path = path[:-1]
    path_chunks = [x for x in path.split("/") if len(x) > 0]
    if not path_chunks:
        return None
    last_chunk = path_chunks[-1].split(".")
    if len(last_chunk) < 2:
        return None
    file_type = last_chunk[-1]
    if len(file_type) <= 5 or file_type.lower() in ALLOWED_TYPES:
        return file_type.lower()
    return None


def valid_url(url: str, test: bool = False) -> bool:
    """The ~10-rule article-URL predicate (urls.py:102-239)."""
    if test:
        url = prepare_url(url)
    if url is None or len(url) < 11:
        return False
    if "mailto:" in url:
        return False
    if "http://" not in url and "https://" not in url:
        return False

    path = urlparse(url).path
    if not path.startswith("/"):
        return False
    if path.endswith("/"):
        path = path[:-1]
    path_chunks = [x for x in path.split("/") if len(x) > 0]

    if len(path_chunks) > 0:
        file_type = url_to_filetype(url)
        if file_type and file_type not in ALLOWED_TYPES:
            return False
        last_chunk = path_chunks[-1].split(".")
        if len(last_chunk) > 1:
            path_chunks[-1] = last_chunk[-2]

    if "index" in path_chunks:
        path_chunks.remove("index")

    tld_dat = extract_domain(url)
    subd = tld_dat.subdomain
    tld = tld_dat.domain.lower()

    url_slug = path_chunks[-1] if path_chunks else ""

    if tld in BAD_DOMAINS:
        return False

    if len(path_chunks) == 0:
        dash_count, underscore_count = 0, 0
    else:
        dash_count = url_slug.count("-")
        underscore_count = url_slug.count("_")

    if url_slug and (dash_count > 4 or underscore_count > 4):
        if dash_count >= underscore_count:
            if tld not in [x.lower() for x in url_slug.split("-")]:
                return True
        if underscore_count > dash_count:
            if tld not in [x.lower() for x in url_slug.split("_")]:
                return True

    if len(path_chunks) <= 1:
        return False

    for b in BAD_CHUNKS:
        if b in path_chunks or b == subd:
            return False

    if re.search(DATE_REGEX, url) is not None:
        return True

    for good in GOOD_PATHS:
        if good.lower() in [p.lower() for p in path_chunks]:
            return True

    return False


def get_domain(abs_url, **kwargs):
    if abs_url is None:
        return None
    return urlparse(abs_url, **kwargs).netloc


def get_scheme(abs_url, **kwargs):
    if abs_url is None:
        return None
    return urlparse(abs_url, **kwargs).scheme


def get_path(abs_url, **kwargs):
    if abs_url is None:
        return None
    return urlparse(abs_url, **kwargs).path


def get_base_domain(url: str) -> str:
    """uk.reuters.com → reuters.com (tests/unit_tests.py:64-76)."""
    domain = get_domain(url)
    tld = ".".join(domain.split(".")[-2:])
    if tld in ["co.uk", "com.au", "au.com"]:
        end_chunks = domain.split(".")[-3:]
    else:
        end_chunks = domain.split(".")[-2:]
    return ".".join(end_chunks)


def extract_meta_refresh(html: str):
    """Meta-refresh redirect target (utils.py:184-204): the url= part of
    <meta http-equiv="refresh" content="0;url=...">, quotes stripped;
    None when absent or the content has no url part."""
    from ..dom import find_by_tag, fromstring

    doc = fromstring(html) if isinstance(html, str) else html
    if doc is None:
        return None
    # a bare '<meta …>' fragment unwraps to the meta element itself, and
    # find_by_tag mirrors getElementsByTag's drop-the-root quirk — so
    # consider the root too (the reference's soup parse finds it)
    candidates = list(find_by_tag(doc, tag="meta", attr="http-equiv", value="refresh"))
    if doc.tag == "meta" and (doc.get("http-equiv") or "").lower() == "refresh":
        candidates.insert(0, doc)
    for el in candidates:
        content = el.get("content")
        if content is None:
            continue
        try:
            _wait_part, url_part = content.split(";")
        except ValueError:
            return None
        if url_part.lower().startswith("url="):
            return url_part[4:].replace('"', "").replace("'", "")
        return None
    return None
