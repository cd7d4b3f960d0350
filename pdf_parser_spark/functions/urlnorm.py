"""URL canonicalization — the dedup/join key normalizer every
Common-Crawl pipeline runs before url-level operations (RFC 3986 §6
syntax-based normalization plus the usual crawl conventions).

Rules, in order:
- strip the fragment;
- lowercase the scheme and the host;
- drop the default port (http:80, https:443), keep explicit others;
- collapse trailing slashes on the path; empty path → '/';
- drop tracking query params (utm_*, fbclid, gclid), sort the rest
  byte-lexicographically, drop the '?' when nothing survives.

Everything is a chain of built-in expressions (regexp_extract /
regexp_replace / split / filter / array_sort / concat) — runs inside
whole-stage codegen, no UDF, scales as a pure map. Patterns are held
to the Java∩RE2 regex subset so the DuckDB oracle can run the same
regexes (same discipline as functions/pii.py).

Reference analog: none — training-data-pipeline brief (web corpus
hygiene).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tracking params dropped during canonicalization (public convention)
TRACKING_RE = "^(utm_[^=]*|fbclid|gclid)(=|$)"

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL as one codegen'd
    expression chain. Inputs without a scheme pass through unchanged
    (relative links are not canonicalizable without a base)."""
    u = F.col(url) if isinstance(url, str) else url
    defrag = F.regexp_replace(u, "#.*", "")
    scheme = F.lower(F.regexp_extract(defrag, _SCHEME_RE, 1))
    rest = F.regexp_replace(defrag, _SCHEME_RE, "")
    authority = F.regexp_extract(rest, "^([^/?]*)", 1)
    host = F.lower(F.regexp_extract(authority, "^([^:]*)", 1))
    port = F.regexp_extract(authority, ":([0-9]+)$", 1)
    default_port = (
        (scheme == "http") & (port == "80")
    ) | ((scheme == "https") & (port == "443"))
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    pathq = rest.substr(F.length(authority) + F.lit(1), F.length(rest))
    return F.when(scheme == "", u).otherwise(
        F.concat(scheme, F.lit("://"), host, port_part, _canon_pathq(pathq))
    )


def _canon_pathq(pathq: Column) -> Column:
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_RE),
        )
    )
    qpart = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    return F.concat(path, qpart)


def canonicalize_url_py(u: str) -> str:
    """Pure-Python twin for unit tests (independent formulation)."""
    import re

    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", u)
    if not m:
        return u
    u = re.sub(r"#.*", "", u)
    scheme = m.group(1).lower()
    rest = u[m.end() :]
    am = re.match(r"^([^/?]*)", rest)
    authority = am.group(1)
    pm = re.search(r":([0-9]+)$", authority)
    host = (authority[: pm.start()] if pm else authority).lower()
    port = pm.group(1) if pm else ""
    if (scheme, port) in (("http", "80"), ("https", "443")):
        port = ""
    pathq = rest[len(authority) :]
    path, _, query = pathq.partition("?")
    path = re.sub(r"/+$", "", path) or "/"
    params = sorted(
        p
        for p in query.split("&")
        if p and not re.match(r"^(utm_[^=]*|fbclid|gclid)(=|$)", p)
    )
    out = f"{scheme}://{host}"
    if port:
        out += f":{port}"
    out += path
    if params:
        out += "?" + "&".join(params)
    return out
