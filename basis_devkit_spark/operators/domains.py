"""Per-domain curation operators (RefinedWeb-style).

Real crawl pipelines cap and dedup BY REGISTRABLE DOMAIN before anything
else (Penedo et al., "The RefinedWeb Dataset for Falcon LLM", 2023 —
URL-level filtering and per-domain caps precede content dedup): a single
mega-host (a link farm, a mirror, one SEO domain) must not dominate the
corpus mix. The registrable domain ("example.co.uk" for
"a.b.example.co.uk") is the eTLD+1 under the Public Suffix List's
algorithm: find the longest known public suffix, keep one label left of
it; unknown TLDs fall back to the PSL default rule (the last label is
the suffix).

Scale shape: suffix matching is a LITERAL MAP lookup (only MULTI-label
suffixes need an entry — the default rule already handles every
single-label TLD), so :func:`registrable_domain` is a pure column
projection: zero joins, zero shuffles, fuses into the scan. Production
deployments load the full Public Suffix List (~9k rules; public domain
data) into the ``suffixes=`` parameter; the built-in
:data:`MULTI_LABEL_SUFFIXES` is a curated common subset with the same
semantics. :func:`domain_cap` then rides the BOUNDED grouped reservoir
(``weighted_reservoir_sample_grouped`` — merge buffers capped at
``merge_fanin × k`` structs), so one mega-domain spanning every map
partition of a 100 TB crawl never funnels through a single reducer or
builds an unbounded merge buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "MULTI_LABEL_SUFFIXES",
    "registrable_domain",
    "domain_cap",
    "url_features",
]

#: Curated multi-label public suffixes (PSL subset). Single-label TLDs
#: (com, org, io, …) are intentionally ABSENT: the PSL default rule —
#: last label is the suffix — covers them without a table entry, so the
#: literal map stays small. Includes private-section suffixes
#: (github.io, blogspot.com, …) because curation wants user sites on
#: shared hosts treated as distinct domains, exactly like the PSL.
MULTI_LABEL_SUFFIXES: tuple[str, ...] = (
    # ccTLD second-level registries
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.in", "net.in", "org.in",
    "co.za", "co.kr", "co.th", "co.il",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "com.pl", "com.ru",
    # private-section shared hosts
    "github.io", "gitlab.io", "blogspot.com", "appspot.com",
    "herokuapp.com", "firebaseapp.com", "netlify.app", "vercel.app",
    "web.app", "pages.dev", "workers.dev", "cloudfront.net",
    "s3.amazonaws.com",
)

#: Deepest suffix the matcher probes. s3.amazonaws.com is the one
#: 3-label entry in the built-in set; the full PSL has a handful of
#: 4-label rules — raise this if you load them.
_MAX_SUFFIX_LABELS = 3


def _host_of(url_col):
    """Lowercased, trailing-dot-stripped host of a URL column.

    ``try_parse_url`` is Spark's JVM-side URL parser (handles userinfo,
    ports, IPv6 brackets; NULL — not an ANSI error — on junk input);
    oracles replay the same extraction with an RE2/Java-identical
    regexp on well-formed URLs.
    """
    host = F.lower(F.try_parse_url(url_col, F.lit("HOST")))
    return F.nullif(F.regexp_replace(host, r"\.$", ""), F.lit(""))


def registrable_domain(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "domain",
    host_col: str | None = None,
    suffixes: list[str] | None = None,
) -> DataFrame:
    """Add ``out_col`` = the registrable domain (eTLD+1) of ``url_col``,
    plus ``host_col`` (the bare host) when requested.

    PSL algorithm, pure column expressions: split the host on dots,
    probe the last 2..``_MAX_SUFFIX_LABELS`` labels against the literal
    multi-label suffix map (longest match wins), default rule otherwise
    (suffix = last label); the registrable domain is one label + the
    suffix. A host that IS a public suffix (``github.io`` itself), a
    single-label host (``localhost``), or an unparseable URL yields the
    host itself / NULL rather than inventing a registrable domain.

    ``suffixes``: multi-label public suffixes to use instead of the
    built-in subset — pass the full PSL here in production (single-label
    entries are redundant and ignored by construction). The map is a
    literal in the plan: zero joins, zero shuffles; beyond ~10k entries
    prefer loading the PSL as a broadcast relation and joining on the
    probed suffix candidates.
    """
    sfx = [s for s in (suffixes or MULTI_LABEL_SUFFIXES) if "." in s]
    by_depth: dict[int, list[str]] = {}
    for s in sfx:
        by_depth.setdefault(min(s.count(".") + 1, _MAX_SUFFIX_LABELS), []).append(s)
    host = _host_of(F.col(url_col))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # Longest-match first, one branch per suffix depth. Membership is
    # `isin` — Catalyst turns a >10-element literal list into a static
    # InSet, so codegen stays compact however many suffixes are loaded
    # (a literal-map lookup re-expanded per branch blew past janino's
    # method limits and knocked the projection out of whole-stage
    # codegen). `n > d` strict: a host that IS a public suffix falls
    # through to the otherwise-host branch.
    dom = F.when(host.isNull(), F.lit(None).cast("string"))
    for d in sorted(by_depth, reverse=True):
        cand = F.concat_ws(".", F.slice(labels, -d, d))
        dom = dom.when(
            (n > d) & cand.isin(*by_depth[d]),
            F.concat_ws(".", F.slice(labels, -(d + 1), d + 1)),
        )
    # PSL default rule: unknown TLD -> the last label is the suffix
    dom = dom.when(n > 1, F.concat_ws(".", F.slice(labels, -2, 2))).otherwise(
        host
    )
    out = df.withColumn(out_col, dom)
    if host_col:
        out = out.withColumn(host_col, host)
    return out


def url_features(
    df: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """URL-level filter signals — the RefinedWeb-style URL scoring
    pass run alongside the domain cap (crawl curation filters on URL
    SHAPE before reading a byte of content: deep calendar/pagination
    paths, parameter-stuffed tracking URLs, binary-asset extensions,
    digit-heavy spam hosts):

    - ``host`` — lowercased host (``try_parse_url``; NULL on junk)
    - ``path_depth`` — non-empty ``/`` path segments
    - ``n_query_params`` — ``&``-separated query parameters
    - ``file_ext`` — lowercased extension of the last path segment
      (1–5 alphanumerics), NULL when none
    - ``is_homepage`` — 1 when the path is ``''``/``'/'`` with no
      query, else 0 (int, not bool: a nullable boolean's NULL turns
      into float NaN in one engine's pandas bridge and None in the
      other, breaking representation-exact comparisons)
    - ``n_host_labels`` — dot-separated host labels
    - ``host_digit_fraction`` — digit chars / host chars, floor-scaled
      1e6 (identical double both engines)
    - ``url_chars`` — raw URL length

    Pure column expressions over Spark's JVM URL parser: one
    projection, fuses into the scan, zero shuffles/joins/UDFs. Every
    feature is NULL-gated on the host: an unparseable or relative URL
    yields NULL across the board (both engines agree by construction
    instead of each guessing at junk)."""
    url = F.col(url_col)
    host = _host_of(url)
    path = F.try_parse_url(url, F.lit("PATH"))
    query = F.try_parse_url(url, F.lit("QUERY"))
    segs = F.filter(
        F.split(F.coalesce(path, F.lit("")), "/"), lambda s: s != ""
    )
    last = F.try_element_at(segs, F.lit(-1))  # NULL on an empty path
    ext = F.lower(
        F.regexp_extract(
            F.coalesce(last, F.lit("")), r"\.([A-Za-z0-9]{1,5})$", 1
        )
    )
    n_host = F.length(host)
    digit_frac = F.when(
        n_host > 0,
        F.floor(
            F.regexp_count(host, F.lit("[0-9]")).cast("double")
            / n_host.cast("double")
            * 1000000.0
            + 0.5
        )
        / 1000000.0,
    ).otherwise(F.lit(0.0))
    gate = lambda c: F.when(host.isNotNull(), c)
    return df.select(
        *df.columns,
        host.alias("host"),
        gate(F.size(segs).cast("int")).alias("path_depth"),
        gate(
            F.when(query.isNull(), F.lit(0))
            .otherwise(F.size(F.split(query, "&")))
            .cast("int")
        ).alias("n_query_params"),
        gate(F.nullif(ext, F.lit(""))).alias("file_ext"),
        gate(
            (
                F.coalesce(path, F.lit("")).isin("", "/") & query.isNull()
            ).cast("int")
        ).alias("is_homepage"),
        gate(F.size(F.split(host, r"\.")).cast("int")).alias(
            "n_host_labels"
        ),
        gate(digit_frac).alias("host_digit_fraction"),
        gate(F.length(url).cast("int")).alias("url_chars"),
    )


def domain_cap(
    df: DataFrame,
    url_col: str = "url",
    max_per_domain: int = 1000,
    keep_by: str | None = None,
    id_col: str = "doc_id",
    out_col: str = "domain",
    merge_fanin: int = 1024,
) -> DataFrame:
    """Cap the corpus at ``max_per_domain`` documents per registrable
    domain — the RefinedWeb-style mega-host guard run before content
    dedup. Keeps the BEST ``keep_by`` docs per domain (quality-weighted
    A-Res reservoir: inclusion proportional to the ``keep_by`` column
    within the domain, exact count, deterministic) or, with
    ``keep_by=None``, a deterministic uniform per-domain sample
    (equal-weight A-Res = salted-md5 priority).

    Returns the surviving rows: input columns + ``out_col`` (the
    registrable domain) + ``domain_rank`` (1-based within the domain).
    NULL domains (unparseable URLs) pass through UNCAPPED with
    ``domain_rank`` NULL — curation decides their fate separately
    (usually a drop; this operator must not silently eat them into one
    giant NULL group).

    Skew note (the reason this exists at all): the hot domain IS the
    skewed key. The per-domain top-k runs on the bounded two-phase
    aggregation tree (local top-k per (domain, partition), then
    ``pid div merge_fanin`` fold levels — no merge buffer over
    ``merge_fanin × max_per_domain`` structs, no Window row_number
    funneling the mega-domain through one reducer task).
    """
    from basis_devkit_spark.operators.text import (
        weighted_reservoir_sample_grouped,
    )

    if max_per_domain < 1:
        raise ValueError("max_per_domain must be >= 1")
    with_dom = registrable_domain(df, url_col, out_col=out_col)
    capped_side = with_dom.filter(F.col(out_col).isNotNull())
    null_side = with_dom.filter(F.col(out_col).isNull()).withColumn(
        "domain_rank", F.lit(None).cast("int")
    )
    weighted = capped_side.withColumn(
        "__w",
        F.col(keep_by).cast("double") if keep_by else F.lit(1.0),
    )
    winners = weighted_reservoir_sample_grouped(
        weighted,
        "__w",
        max_per_domain,
        group_col=out_col,
        id_col=id_col,
        salt="domcap",
        merge_fanin=merge_fanin,
    ).select(
        out_col, id_col, F.col("rank").alias("domain_rank")
    )
    kept = capped_side.join(winners, [out_col, id_col]).select(
        *df.columns, out_col, "domain_rank"
    )
    return kept.unionByName(
        null_side.select(*df.columns, out_col, "domain_rank")
    )
