"""URL canonicalization operators — the web-pipeline normalization pass
that precedes url-keyed dedup/bucketing (two crawls of the same page with
different tracking params must land in the same url-hash bucket, or the
lineage layout and exact-dup pass silently treat them as distinct pages).

Canonical form (documented spec, applied in order):

1. scheme and host lowercased (path/query case preserved — paths are
   case-sensitive); userinfo (``user:pw@``) dropped from the authority
   (case-sensitive per RFC 3986 — folding it conflates distinct URLs —
   and credentials don't belong in bucketing keys);
2. default ports ``:80``/``:443`` stripped from the authority;
3. fragment stripped;
4. tracking params removed: ``utm_*`` and ``fbclid``;
5. duplicate slashes in the path collapsed; trailing slash stripped
   (except the bare root path ``/``); empty path → ``/``;
6. empty query (after tracking removal) drops its ``?``.

Everything is ``regexp_extract`` + empty-replacement ``regexp_replace``
— no backreference replacements, so the identical patterns run under
Java regex (Spark) and RE2 (DuckDB oracle) with the same results.
Non-absolute/unparseable URLs yield NULL (callers quarantine them).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_REST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$"
_TRACKING_RE = r"&(?:utm_[A-Za-z_]*|fbclid)=[^&]*"


def _scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def host_of(url: Column) -> Column:
    """Lowercased host with the scheme's OWN default port stripped
    (``:80`` for http, ``:443`` for https — ``http://h:443`` keeps its
    non-default port); '' when the URL has no ``scheme://authority``
    prefix. Userinfo (``user:pw@``) is DROPPED before lowercasing: it is
    case-sensitive per RFC 3986, so folding it would conflate distinct
    URLs, and keeping credentials in a host-bucketing key leaks them into
    every downstream table — crawl pipelines quarantine such URLs anyway."""
    hp = F.lower(
        F.regexp_replace(F.regexp_extract(url, _HOSTPORT_RE, 1), r"^[^@]*@", "")
    )
    scheme = _scheme(url)
    return (
        F.when(scheme == "http", F.regexp_replace(hp, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hp, r":443$", ""))
        .otherwise(hp)
    )


def _path_and_query(url: Column) -> tuple[Column, Column]:
    rest = F.regexp_replace(F.regexp_extract(url, _REST_RE, 1), r"#.*$", "")
    raw_path = F.regexp_extract(rest, r"^([^?]*)", 1)
    # normalize: collapse //, strip trailing / (keep bare root), empty → /
    collapsed = F.regexp_replace(raw_path, r"/{2,}", "/")
    path = F.when(collapsed == "", F.lit("/")).otherwise(
        F.when(collapsed == "/", collapsed).otherwise(
            F.regexp_replace(collapsed, r"/$", "")
        )
    )
    # query with tracking params removed: prefix '&' so every param matches
    # the same '&'-anchored pattern, strip the artificial prefix after
    query = F.regexp_replace(
        F.regexp_replace(
            F.concat(F.lit("&"), F.regexp_extract(rest, r"\?(.*)$", 1)),
            _TRACKING_RE,
            "",
        ),
        r"^&",
        "",
    )
    return path, query


def canonical_url(url: Column) -> Column:
    """Canonical form per the module spec; NULL for non-absolute URLs."""
    scheme, host = _scheme(url), host_of(url)
    path, query = _path_and_query(url)
    assembled = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when((scheme != "") & (host != ""), assembled)


def url_depth(url: Column) -> Column:
    """Number of non-empty path segments of the canonical path."""
    path, _ = _path_and_query(url)
    return F.size(F.filter(F.split(path, "/"), lambda x: x != "")).cast("long")
