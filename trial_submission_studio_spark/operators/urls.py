"""URL normalization, domain extraction, and crawl governance.

C4 deduplicated at URL level and filtered against domain blocklists
before any content-based stage; RefinedWeb/CCNet do the same. These
operators implement that layer entirely with JVM expressions
(``parse_url`` + array ops — whole-stage codegen, zero Python, zero
shuffle except the dedup's one groupBy), so they can run as the very
first gate over a 100 TB crawl scan.

Reference parity note: the reference engine
(rubentalstra/Trial-Submission-Studio) has no web layer; this module
belongs to the training-data extension surface (SURVEY.md §2.13),
pairing with `sources/warc.py`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Query parameters that never change page content — strip on
#: normalization (the standard tracking-param families).
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "utm_id", "gclid", "fbclid", "msclkid", "mc_cid",
    "mc_eid", "igshid", "ref", "ref_src",
)

#: Common second-level public suffixes: when a host ends in one of
#: these, the registered domain keeps THREE labels (example.co.uk),
#: else two (example.com). A curated subset of the public-suffix list
#: — the long tail needs the full PSL, which is a data file, not an
#: algorithm change; swap this tuple for the full set in production.
SECOND_LEVEL_SUFFIXES = tuple(
    f"{sld}.{tld}"
    for tld in ("uk", "au", "nz", "jp", "in", "za", "br", "mx", "kr", "tw")
    for sld in ("co", "com", "org", "net", "ac", "gov", "edu")
)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_host(c: Column | str) -> Column:
    """Lower-cased host without a leading ``www.`` (JVM try_parse_url — NULL, never an ANSI error, on invalid URLs)."""
    host = F.lower(F.try_parse_url(_col(c).cast("string"), F.lit("HOST")))
    return F.regexp_replace(host, r"^www\.", "")


def url_registered_domain(c: Column | str) -> Column:
    """eTLD+1 ("registrable domain"): last two host labels, or three
    when the host ends in a second-level public suffix (co.uk et al).
    Pure array expressions over the split host."""
    host = url_host(c)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    sld = F.array(*[F.lit(s) for s in SECOND_LEVEL_SUFFIXES])
    take3 = F.array_contains(sld, last2) & (n >= 3)
    return F.when(
        take3,
        F.concat_ws(
            ".", F.element_at(labels, -3), F.element_at(labels, -2),
            F.element_at(labels, -1),
        ),
    ).otherwise(F.when(n >= 2, last2).otherwise(host))


def normalize_url(
    c: Column | str,
    strip_params: tuple[str, ...] = TRACKING_PARAMS,
) -> Column:
    """Canonical URL for dedup keys: lower-cased scheme and host,
    ``www.`` and fragment dropped, default ports removed, tracking
    query params removed and the remainder SORTED (param order never
    changes content), trailing ``/`` trimmed. NULL-safe; non-URLs
    (no host) pass through trimmed so the dedup key still works on
    partial records."""
    raw = F.trim(_col(c).cast("string"))
    scheme = F.lower(F.try_parse_url(raw, F.lit("PROTOCOL")))
    host = url_host(raw)
    port = F.regexp_extract(raw, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*:(\d+)", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = _trim_slash(F.coalesce(F.try_parse_url(raw, F.lit("PATH")), F.lit("")))
    query = F.try_parse_url(raw, F.lit("QUERY"))
    drop = F.array(*[F.lit(p) for p in strip_params])
    params = F.when(
        query.isNull() | (query == ""), F.array().cast("array<string>")
    ).otherwise(F.split(query, "&"))
    kept = F.sort_array(
        F.filter(
            params,
            lambda p: (p != "")
            & ~F.array_contains(drop, F.lower(F.split_part(p, F.lit("="), F.lit(1)))),
        )
    )
    qs = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(F.lit(""))
    rebuilt = F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path, qs,
    )
    return F.when(raw.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(host.isNull() | (host == ""), raw).otherwise(rebuilt)
    )


def _trim_slash(path: Column) -> Column:
    return F.when(
        (F.length(path) > 1) & F.endswith(path, F.lit("/")),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)


def domain_blocklist_filter(
    df: DataFrame,
    url_col: str,
    blocked_domains: DataFrame | list[str],
    domain_col: str = "domain",
) -> DataFrame:
    """Drop rows whose registered domain is blocklisted. The
    blocklist broadcasts (domain lists are small even in production);
    matching is on eTLD+1, so ``spam.example.com`` falls to a
    blocklist entry ``example.com``."""
    spark = df.sparkSession
    if isinstance(blocked_domains, list):
        blocked = spark.createDataFrame(
            [(d,) for d in blocked_domains], f"{domain_col} string"
        )
    else:
        blocked = blocked_domains
    blocked = F.broadcast(
        blocked.select(F.lower(F.col(domain_col)).alias("__blocked_domain")).distinct()
    )
    keyed = df.withColumn("__rd", url_registered_domain(url_col))
    return (
        keyed.join(
            blocked, keyed["__rd"] == blocked["__blocked_domain"], "left_anti"
        ).drop("__rd")
    )


def url_dedup(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """URL-level exact dedup (the C4 first pass): one survivor (min
    id) per normalized URL. One groupBy on the canonical-URL hash —
    shuffles 8-byte keys + ids, never page content."""
    keyed = df.withColumn("__curl", F.xxhash64(normalize_url(url_col)))
    survivors = keyed.groupBy("__curl").agg(F.min(id_col).alias(id_col))
    return (
        keyed.join(survivors, [ "__curl", id_col], "left_semi").drop("__curl")
    )
